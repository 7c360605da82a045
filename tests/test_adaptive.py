"""Adaptive timestepping (World.update_adaptive / update_state_adaptive).

The dynamic counterpart of the CLI's static --dt auto: each substep
re-evaluates the softening-resolution criterion on fresh accelerations,
clamps to [dt_min, dt_max], and the last substep lands exactly on t_span.
"""

import dataclasses

import numpy as np
import pytest

import nbody_tpu as nb
from nbody_tpu.types import make_particles
from helpers import TINY


def test_force_free_world_takes_dt_max_steps():
    """No forces: the criterion returns +inf, dt clamps to dt_max, and the
    tracer drifts EXACTLY v * t_span (the final substep shrinks to land on
    the span; the per-substep dts sum to t_span by construction)."""
    p = make_particles(np.zeros((1, 2), np.float32),
                       vel=np.asarray([[2.0, -1.0]], np.float32))
    w = nb.create_world(p, config=TINY)
    k = w.update_adaptive(1.0, dt_max=0.3, backend="jnp")
    assert k == 4                                   # 0.3+0.3+0.3+0.1
    np.testing.assert_allclose(np.asarray(w.particles.pos)[0],
                               [2.0, -1.0], rtol=1e-6)


def test_matches_fixed_dt_when_clamped():
    """dt_min == dt_max: adaptive degenerates to fixed stepping (modulo the
    fp-shortened final substep), so it must track world.update closely."""
    scene = nb.make_galaxies(250, 1, seed=4)
    a = nb.create_world(scene, config=TINY)
    b = nb.create_world(scene, config=TINY)
    k = a.update_adaptive(0.1, dt_min=0.01, dt_max=0.01, backend="jnp")
    b.update(0.01, 10, backend="jnp")
    assert k in (10, 11)                            # fp t-accumulation
    np.testing.assert_allclose(np.asarray(a.particles.pos),
                               np.asarray(b.particles.pos),
                               rtol=1e-4, atol=1e-3)


def test_tight_encounter_shrinks_dt():
    """A close massive pair drives |a| up; the adaptive dt must come out
    well below dt_max (more substeps than the force-free count)."""
    p = make_particles(np.asarray([[0.0, 0.0], [2.0, 0.0]], np.float32),
                       mass=np.asarray([50.0, 50.0], np.float32),
                       radius=np.asarray([0.5, 0.5], np.float32))
    w = nb.create_world(p, config=TINY)
    k = w.update_adaptive(0.5, eta=0.05, dt_max=0.25, backend="jnp")
    assert k > 10                                   # vs 2 at dt_max
    assert np.isfinite(np.asarray(w.particles.pos)).all()


def test_composes_with_merging():
    """Adaptive stepping engages exactly where merging does (close
    encounters): both on, mass conserved through the while_loop."""
    cfg = dataclasses.replace(TINY, merge_collisions=True)
    rng = np.random.default_rng(2)
    n = 48
    p = make_particles(rng.uniform(-2, 2, (n, 2)).astype(np.float32),
                       vel=rng.normal(0, 0.1, (n, 2)).astype(np.float32),
                       mass=rng.uniform(0.5, 2.0, n).astype(np.float32),
                       radius=np.full(n, 0.35, np.float32))
    w = nb.create_world(p, config=cfg)
    m0 = float(np.asarray(w.particles.mass).sum())
    k = w.update_adaptive(0.05, dt_max=0.005, backend="jnp")
    out = w.particles
    assert k >= 10
    assert (np.asarray(out.mass) > 0).sum() < n     # merges happened
    assert float(out.mass.sum()) == pytest.approx(m0, rel=1e-5)
    # gm tracks the merged masses through the adaptive loop too
    np.testing.assert_allclose(np.asarray(w.gm)[:w.mass_len],
                               10.0 * np.asarray(out.mass)[:w.mass_len],
                               rtol=1e-6)


def test_retuning_does_not_recompile():
    """eta/dt bounds/t_span are traced: changing them reuses the compiled
    while_loop (guarded via jit cache stats)."""
    import jax

    scene = nb.make_galaxies(250, 1, seed=4)
    w = nb.create_world(scene, config=TINY)
    from nbody_tpu.world import update_state_adaptive

    w.update_adaptive(0.02, backend="jnp")
    after_first = update_state_adaptive._cache_size()
    w.update_adaptive(0.05, eta=0.2, dt_min=1e-4, dt_max=0.5, backend="jnp")
    assert update_state_adaptive._cache_size() == after_first


def test_sharded_adaptive_matches_single_chip():
    # the global psum'd criterion must reproduce the single-chip dt
    # sequence (the min over shards == the min over the world)
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(256, 1, seed=13)
    w = nb.create_world(scene, config=TINY)
    n_single = w.update_adaptive(0.05, dt_max=0.02)

    sw = ShardedWorld(scene, make_mesh(4), config=TINY, force_backend="jnp")
    n_sharded = sw.update_adaptive(0.05, dt_max=0.02)

    assert abs(n_single - n_sharded) <= 1
    ref = np.asarray(w.particles.pos)
    got = np.asarray(sw.particles.pos)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-4)


def test_sharded_adaptive_force_free_counts_exactly():
    # all-massless: acc == 0 -> criterion inf -> every substep is dt_max;
    # t_span/dt_max steps exactly, identical on any mesh size
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    rng = np.random.default_rng(3)
    p = make_particles(rng.normal(size=(64, 2)).astype(np.float32),
                       vel=rng.normal(size=(64, 2)).astype(np.float32))
    sw = ShardedWorld(p, make_mesh(8), config=TINY, force_backend="jnp")
    assert sw.update_adaptive(0.1, dt_max=0.01) in (10, 11)  # fp t-accum
    drift = np.asarray(sw.particles.pos) - np.asarray(p.pos)
    np.testing.assert_allclose(drift, 0.1 * np.asarray(p.vel), atol=1e-6)


def test_sharded_adaptive_with_hook_pm():
    # adaptive + extra_force on the pm collective path
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    from nbody_tpu.types import SimConfig

    scene = nb.make_galaxies(256, 1, seed=17)
    cfg = SimConfig(tile_targets=128, pm_grid=128)
    sw = ShardedWorld(scene, make_mesh(4), config=cfg, force_backend="pm")
    n = sw.update_adaptive(0.02, dt_max=0.01,
                           extra_force=lambda p, v: -0.1 * v)
    assert n >= 2
    assert np.isfinite(np.asarray(sw.particles.pos)).all()
