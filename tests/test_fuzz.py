"""Randomized cross-backend consistency fuzzing: random worlds, random
backend sequences, invariant checks — the broad net over everything the
targeted tests might miss."""

import numpy as np
from helpers import TINY
import pytest

from nbody_tpu import create_world, make_particles
from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
from nbody_tpu.types import SimConfig
from nbody_tpu.utils.checks import check_state, validate_world_invariants

BACKENDS = ["jnp", "pallas", "pallas_fused"]


def random_particles(rng, n):
    massless = rng.uniform(size=n) < rng.uniform(0, 0.9)
    return make_particles(
        (rng.uniform(10, 1000) * rng.normal(size=(n, 2))).astype(np.float32),
        vel=rng.normal(size=(n, 2)).astype(np.float32),
        mass=np.where(massless, 0.0, rng.uniform(1, 1e5, n)).astype(np.float32),
        radius=np.where(massless, 0.5, rng.uniform(0.5, 9.5, n)).astype(np.float32),
    )


@pytest.mark.parametrize("seed", range(5))
def test_random_world_backend_consistency(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 120))
    p = random_particles(rng, n)
    dt = float(rng.uniform(0.001, 0.05))
    steps = int(rng.integers(1, 8))
    # the integrator axis rides the same fuzz net: all backends must agree
    # under whichever composition the seed draws
    import dataclasses

    integ = rng.choice(["euler", "leapfrog", "yoshida4"])
    cfg = dataclasses.replace(TINY, integrator=str(integ))

    worlds = {b: create_world(p, config=cfg) for b in BACKENDS}
    for b, w in worlds.items():
        w.update(dt, steps, backend=b)
        check_state(w.state, context=f"{b} seed={seed}")
        validate_world_invariants(w)

    ref = np.asarray(worlds["jnp"].particles.pos)
    scale = max(1.0, np.abs(ref).max())
    for b in BACKENDS[1:]:
        got = np.asarray(worlds[b].particles.pos)
        assert np.abs(got - ref).max() / scale < 1e-4, f"{b} diverged at seed {seed}"


@pytest.mark.parametrize("seed", range(3))
def test_random_sharded_consistency(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(8, 200))
    d = int(rng.choice([2, 4, 8]))
    p = random_particles(rng, n)
    dt = float(rng.uniform(0.001, 0.03))

    w = create_world(p, config=TINY)
    sw = ShardedWorld(p, make_mesh(d), config=TINY, force_backend="jnp")
    w.update(dt, 3, backend="jnp")
    sw.update(dt, 3)

    ref = np.asarray(w.particles.pos)
    got = np.asarray(sw.particles.pos)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 1e-4, f"sharded diverged seed={seed} d={d} n={n}"


def test_tiny_n_on_many_devices():
    # fewer real particles than devices x alignment: padding must carry it
    rng = np.random.default_rng(7)
    p = random_particles(rng, 10)
    sw = ShardedWorld(p, make_mesh(8), config=TINY, force_backend="jnp")
    sw.update(0.01, 2)
    host = sw.particles
    assert host.pos.shape == (10, 2)
    assert np.all(np.isfinite(np.asarray(host.pos)))


@pytest.mark.parametrize("seed", range(3))
def test_random_sharded_p3m_matches_single(seed):
    """Collective p3m claims EXACT single-device parity (same capacity
    semantics, fp32 order only) for arbitrary worlds — fuzz it, including
    the rebin chunk loop, overflowing cells, and mostly-massless draws."""
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(16, 300))
    d = int(rng.choice([2, 4, 8]))
    rebin = int(rng.choice([1, 3]))
    p = random_particles(rng, n)
    dt = float(rng.uniform(0.001, 0.03))
    cfg = SimConfig(tile_targets=64, pm_grid=64, p3m_cell_capacity=8,
                    p3m_exact_targets=4, p3m_rebin_interval=rebin)

    w = create_world(p, config=cfg, default_backend="p3m")
    sw = ShardedWorld(p, make_mesh(d), config=cfg, force_backend="p3m")
    w.update(dt, 4)
    sw.update(dt, 4)
    a = np.asarray(w.particles.pos)
    b = np.asarray(sw.particles.pos)
    assert np.all(np.isfinite(b)), f"seed {seed}"
    scale = max(1.0, np.abs(a).max())
    assert np.abs(a - b).max() / scale < 5e-6, (
        f"sharded p3m diverged at seed {seed} (D={d}, rebin={rebin})")


@pytest.mark.parametrize("seed", range(3))
def test_random_world_p3m_tracks_exact(seed):
    """p3m on RANDOM (non-clustered) worlds: the adversarial occupancy case
    for the pp_chunk empty-skip (most cells active) and for the adaptive
    box. Near-exact tolerance, invariants, both pp_chunk settings agree."""
    from nbody_tpu.types import SimConfig

    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(16, 120))
    p = random_particles(rng, n)
    dt = float(rng.uniform(0.001, 0.02))
    steps = int(rng.integers(1, 6))

    cfg = SimConfig(tile_targets=8, tile_sources=128, pm_grid=64,
                    p3m_cell_capacity=32)
    ref_w = create_world(p, config=cfg)
    ref_w.update(dt, steps, backend="jnp")
    ref = np.asarray(ref_w.particles.pos)
    scale = max(1.0, np.abs(ref).max())

    outs = {}
    for pp_chunk in (64, 0):
        c = SimConfig(tile_targets=8, tile_sources=128, pm_grid=64,
                      p3m_cell_capacity=32, p3m_pp_chunk=pp_chunk)
        w = create_world(p, config=c)
        w.update(dt, steps, backend="p3m")
        check_state(w.state, context=f"p3m chunk={pp_chunk} seed={seed}")
        validate_world_invariants(w)
        outs[pp_chunk] = np.asarray(w.particles.pos)
        assert np.abs(outs[pp_chunk] - ref).max() / scale < 5e-3, (
            f"p3m diverged from exact at seed {seed}")
    assert np.abs(outs[64] - outs[0]).max() / scale < 1e-5


@pytest.mark.parametrize("seed", range(3))
def test_random_sharded_merging_matches_single(seed):
    """Random dense worlds under merge_collisions: the sharded jit-level
    merge pass must reproduce the single-chip merges bit-exactly in mass
    (same winners, same order) for random mesh sizes and substep counts."""
    import dataclasses

    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(16, 150))
    d = int(rng.choice([2, 4, 8]))
    # tight cluster so contacts actually happen
    p = make_particles(
        (rng.uniform(2, 8) * rng.normal(size=(n, 2))).astype(np.float32),
        vel=rng.normal(size=(n, 2)).astype(np.float32),
        mass=rng.uniform(0, 1e4, n).astype(np.float32),
        radius=rng.uniform(0.5, 4.0, n).astype(np.float32),
    )
    dt = float(rng.uniform(0.001, 0.02))
    steps = int(rng.integers(2, 10))
    cfg = dataclasses.replace(TINY, merge_collisions=True)

    w = create_world(p, config=cfg)
    w.update(dt, steps, backend="jnp")
    sw = ShardedWorld(p, make_mesh(d), config=cfg, force_backend="jnp")
    sw.update(dt, steps)

    validate_world_invariants(w)
    validate_world_invariants(sw)
    np.testing.assert_array_equal(np.asarray(sw.particles.mass),
                                  np.asarray(w.particles.mass))
    ref = np.asarray(w.particles.pos)
    scale = max(1.0, np.abs(ref).max())
    # masses are the strong (exact) assertion; positions only track loosely:
    # post-merge bodies sit in close encounters where fp summation-order
    # noise between the ring and single-chip force grows chaotically
    assert np.abs(np.asarray(sw.particles.pos) - ref).max() / scale < 3e-3


@pytest.mark.parametrize("seed", range(2))
def test_random_sharded_adaptive_matches_single(seed):
    """Random worlds under adaptive stepping: substep counts agree (the
    criterion min is a collective) and trajectories track."""
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(16, 150))
    d = int(rng.choice([2, 4]))
    p = random_particles(rng, n)
    t_span = float(rng.uniform(0.01, 0.05))

    w = create_world(p, config=TINY)
    k1 = w.update_adaptive(t_span, dt_max=0.01, backend="jnp")
    sw = ShardedWorld(p, make_mesh(d), config=TINY, force_backend="jnp")
    k2 = sw.update_adaptive(t_span, dt_max=0.01)

    assert abs(k1 - k2) <= 1, (k1, k2)
    ref = np.asarray(w.particles.pos)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(np.asarray(sw.particles.pos) - ref).max() / scale < 1e-3
