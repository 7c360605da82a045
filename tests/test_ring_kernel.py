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


@pytest.mark.parametrize("n_devices", [1, 2, 4])
def test_streaming_sources_mode(n_devices):
    """Forced streaming mode (comm in HBM space, source tiles DMA'd through
    VMEM) must match resident mode exactly."""
    import jax
    from jax.sharding import PartitionSpec as P
    from nbody_tpu.ops.ring_forces import ring_substep
    from nbody_tpu.parallel.sharding import AXIS

    rng = np.random.default_rng(53)
    t_loc, s_loc = 16, 128
    mesh = make_mesh(n_devices)

    def make_args():
        pos = rng.normal(size=(t_loc, 2)).astype(np.float32) * 50
        vel = rng.normal(size=(t_loc, 2)).astype(np.float32)
        radius = rng.uniform(0.5, 5.0, t_loc).astype(np.float32)
        valid = np.ones((t_loc, 1), np.float32)
        src = np.zeros((3, s_loc), np.float32)
        src[0] = rng.normal(size=s_loc) * 50
        src[1] = rng.normal(size=s_loc) * 50
        src[2, :40] = rng.uniform(10, 100, 40)
        return pos, vel, radius, valid, src

    args = make_args()

    # simpler: single-device direct-call comparison per device count via vmap-free path
    import jax.numpy as jnp

    def jnp_f32(x):
        return jnp.float32(x)

    if n_devices == 1:
        pos, vel, radius, valid, src = (jnp.asarray(a) for a in args)
        a = ring_substep(jnp.float32(0.01), pos, vel, radius, valid, src,
                         axis=None, n_devices=1, tile_t=8, tile_s=128,
                         stream_sources=False)
        b = ring_substep(jnp.float32(0.01), pos, vel, radius, valid, src,
                         axis=None, n_devices=1, tile_t=8, tile_s=128,
                         stream_sources=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    else:
        p = random_particles(16 * n_devices, seed=57)
        sa = ShardedWorld(p, mesh, config=TINY, force_backend="pallas_ring")
        sb = create_world(p, config=TINY)
        # force streaming inside the sharded path by monkeypatching default
        import nbody_tpu.parallel.sharding as sh
        orig = sh._fused_ring_step_shard

        def patched(pos, vel, radius, gm_src, src_pos0, valid, dt, *,
                    n_devices, config, pos_dt=1.0):
            import jax.numpy as jnp
            from nbody_tpu.ops.ring_forces import ring_substep as rs
            src = jnp.stack([src_pos0[:, 0], src_pos0[:, 1], gm_src], axis=0)
            return rs(dt, pos, vel, radius, valid, src, axis=sh.AXIS,
                      n_devices=n_devices, tile_t=config.tile_targets,
                      tile_s=config.tile_sources, precise=config.precise,
                      stream_sources=True)

        sh._fused_ring_step_shard = patched
        try:
            sa._update_fn, sa._adaptive_fn, sa._record_fn = sa._build_update()
            sa.update(0.01, 2)
        finally:
            sh._fused_ring_step_shard = orig
        sb.update(0.01, 2, backend="jnp")
        np.testing.assert_allclose(
            np.asarray(sa.particles.pos), np.asarray(sb.particles.pos),
            rtol=3e-4, atol=3e-3,
        )
