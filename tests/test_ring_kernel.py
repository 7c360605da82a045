"""Fused force+RDMA ring kernel (interpret mode, virtual CPU mesh): parity
against the single-device world and the XLA-collective ring."""

import numpy as np
from helpers import TINY, random_particles
import pytest

from nbody_tpu import create_world, make_particles
from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
from nbody_tpu.types import SimConfig


@pytest.mark.parametrize("n_devices", [1, 2, 3, 4])
def test_fused_ring_matches_single_device(n_devices):
    p = random_particles(64, seed=41)
    sw = ShardedWorld(p, make_mesh(n_devices), config=TINY, force_backend="pallas_ring")
    w = create_world(p, config=TINY)
    sw.update(0.01, 3)
    w.update(0.01, 3, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos), rtol=3e-4, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(sw.particles.vel), np.asarray(w.particles.vel), rtol=3e-4, atol=3e-3
    )


def test_fused_ring_matches_xla_ring():
    p = random_particles(96, seed=43)
    a = ShardedWorld(p, make_mesh(4), config=TINY, force_backend="pallas_ring")
    b = ShardedWorld(p, make_mesh(4), config=TINY, force_backend="jnp")
    a.update(0.02, 2)
    b.update(0.02, 2)
    np.testing.assert_allclose(
        np.asarray(a.particles.pos), np.asarray(b.particles.pos), rtol=1e-4, atol=1e-4
    )


def test_fused_ring_massless_and_finite():
    p = random_particles(64, seed=47, massless_frac=0.7)
    sw = ShardedWorld(p, make_mesh(2), config=TINY, force_backend="pallas_ring")
    sw.update(0.01, 2)
    host = sw.particles
    assert np.all(np.isfinite(np.asarray(host.pos)))
    acc = np.asarray(host.acc)
    assert np.any(acc != 0)
