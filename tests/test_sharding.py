"""Ring-sharded multi-device path, tested on the 8-device virtual CPU mesh
(the CI-testable 'fake pod' of SURVEY.md §4d). Parity vs the single-device
World must be exact up to fp32 reduction-order differences."""

import jax
from helpers import TINY, random_particles
import numpy as np
import pytest

from nbody_tpu import create_world, make_galaxies, make_particles
from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
from nbody_tpu.types import SimConfig


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_matches_single_device(n_devices):
    p = random_particles(96, seed=17)
    mesh = make_mesh(n_devices)
    sw = ShardedWorld(p, mesh, config=TINY, force_backend="jnp")
    w = create_world(p, config=TINY)
    sw.update(0.01, 5)
    w.update(0.01, 5, backend="jnp")
    # same partition order on both sides -> rows comparable directly
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos), rtol=3e-4, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(sw.particles.vel), np.asarray(w.particles.vel), rtol=3e-4, atol=3e-3
    )


def test_sharded_galaxy_scene():
    p = make_galaxies(400, 2, seed=11037)
    sw = ShardedWorld(p, make_mesh(8), config=TINY, force_backend="jnp")
    sw.update(0.01, 10)
    host = sw.particles
    assert np.all(np.isfinite(np.asarray(host.pos)))
    assert host.pos.shape == (400, 2)


def test_sharded_substep_batching():
    p = random_particles(64, seed=23)
    a = ShardedWorld(p, make_mesh(4), config=TINY, force_backend="jnp")
    b = ShardedWorld(p, make_mesh(4), config=TINY, force_backend="jnp")
    a.update(0.02, 4)
    for _ in range(4):
        b.update(0.02, 1)
    np.testing.assert_allclose(
        np.asarray(a.particles.pos), np.asarray(b.particles.pos), rtol=1e-6
    )


def test_sharded_massless_rule_preserved():
    # sources rotated around the ring are exactly the massive prefix
    p = random_particles(48, seed=29, massless_frac=0.6)
    sw = ShardedWorld(p, make_mesh(4), config=TINY, force_backend="jnp")
    assert sw.src_len % sw.n_devices == 0
    gm = np.asarray(sw.gm_src)
    # count of non-zero gm == mass_len
    assert np.count_nonzero(gm) == sw.mass_len


def test_sharded_pallas_interpret_smoke():
    # the pallas kernel path inside shard_map, interpret mode on CPU
    p = random_particles(64, seed=31)
    sw = ShardedWorld(p, make_mesh(2), config=TINY, force_backend="pallas")
    w = create_world(p, config=TINY)
    sw.update(0.01, 2)
    w.update(0.01, 2, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos), rtol=3e-4, atol=3e-3
    )


def test_unknown_force_backend_raises():
    # a typo'd force_backend must not silently construct a world that the
    # per-backend dispatch later routes to an arbitrary branch
    p = random_particles(64, seed=32)
    with pytest.raises(ValueError, match="unknown force_backend"):
        ShardedWorld(p, make_mesh(2), config=TINY, force_backend="cuda")
