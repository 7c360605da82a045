"""Inelastic collision merging (SimConfig.merge_collisions; ops/collisions.py).

Beyond-reference capability. The design invariants under test: exact
mass/momentum transfer, volume-additive radii, lighter-into-heavier with
index tiebreak, chain deferral (a winner is never zeroed in the same
pass), static shapes (absorbed rows become massless tracers), and an
exact no-op on contact-free worlds.
"""

import dataclasses

import numpy as np
import pytest

import nbody_tpu as nb
from nbody_tpu.types import make_particles
from helpers import TINY

MERGE = dataclasses.replace(TINY, merge_collisions=True)
DT = 1e-4  # tiny: merge geometry dominates, gravity barely moves anything


def _world(pos, mass, radius, vel=None, config=MERGE):
    pos = np.asarray(pos, np.float32)
    p = make_particles(
        pos,
        vel=None if vel is None else np.asarray(vel, np.float32),
        mass=np.asarray(mass, np.float32),
        radius=np.asarray(radius, np.float32),
    )
    return nb.create_world(p, config=config)


def test_two_body_merge_conserves_everything():
    w = _world([[0.0, 0.0], [1.0, 0.0]], mass=[5.0, 3.0], radius=[0.7, 0.7])
    w.update(DT, 1, backend="jnp")
    p = w.particles
    # heavier (index 0) absorbed the lighter
    assert p.mass[0] == pytest.approx(8.0)
    assert p.mass[1] == 0.0
    # center of mass and momentum conserved (started at rest; internal
    # gravity kicks cancel in the total)
    assert p.pos[0] @ np.array([1.0, 0.0]) == pytest.approx(3.0 / 8.0, abs=1e-4)
    mom = (p.mass[:, None] * p.vel).sum(0)
    assert np.abs(mom).max() < 1e-5
    # volume-additive radius; absorbed row is a standard tracer riding along
    assert p.radius[0] == pytest.approx((2 * 0.7**3) ** (1 / 3), rel=1e-5)
    assert p.radius[1] == pytest.approx(0.5)
    np.testing.assert_allclose(p.pos[1], p.pos[0])
    np.testing.assert_allclose(p.vel[1], p.vel[0])


def test_equal_masses_lower_index_wins():
    w = _world([[0.0, 0.0], [1.0, 0.0]], mass=[3.0, 3.0], radius=[0.7, 0.7])
    w.update(DT, 1, backend="jnp")
    p = w.particles
    assert p.mass[0] == pytest.approx(6.0) and p.mass[1] == 0.0


def test_chain_defers_one_substep():
    """A(1) contacts only B(2); B contacts C(4): B→C merges this substep,
    A is deferred because its winner is itself a loser."""
    w = _world([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]],
               mass=[1.0, 2.0, 4.0], radius=[0.6, 0.6, 0.6])
    w.update(DT, 1, backend="jnp")
    p = w.particles
    assert p.mass[0] == pytest.approx(1.0)      # deferred
    assert p.mass[1] == 0.0                     # absorbed by C
    assert p.mass[2] == pytest.approx(6.0)
    assert p.mass.sum() == pytest.approx(7.0)   # nothing lost in the chain


def test_contact_free_world_is_bit_identical():
    scene = nb.make_galaxies(250, 1, seed=5)
    # stock galaxy: bodies are well separated at generation time
    a = nb.create_world(scene, config=MERGE)
    b = nb.create_world(scene, config=TINY)
    a.update(0.01, 3, backend="jnp")
    b.update(0.01, 3, backend="jnp")
    np.testing.assert_array_equal(np.asarray(a.particles.pos),
                                  np.asarray(b.particles.pos))
    np.testing.assert_array_equal(np.asarray(a.particles.mass),
                                  np.asarray(b.particles.mass))


def _dense_cluster(config, n=64):
    rng = np.random.default_rng(1)
    return _world(rng.uniform(-3, 3, (n, 2)),
                  mass=rng.uniform(0.5, 2.0, n),
                  radius=np.full(n, 0.4),
                  vel=rng.normal(0, 0.2, (n, 2)),
                  config=config)


def test_merges_conserve_momentum_exactly():
    """Gravity off (g ~ 0): ballistic bodies overlap and merge; the merge
    pass itself must conserve mass and momentum to fp exactness. (With
    gravity ON, momentum drifts through the reference's asymmetric
    softening — r² = d² + radius_target breaks Newton's third law whenever
    radii differ, merged bodies included; that drift is a property of the
    reference force law, not of merging — see test below.)"""
    cfg = dataclasses.replace(MERGE, g=1e-12)
    w = _dense_cluster(cfg)
    n = 64
    m0 = float(np.asarray(w.particles.mass).sum())
    p0 = (np.asarray(w.particles.mass)[:, None]
          * np.asarray(w.particles.vel)).sum(0)
    w.update(0.05, 40, backend="jnp")
    p = w.particles
    assert (p.mass > 0).sum() < n               # merges actually happened
    assert float(p.mass.sum()) == pytest.approx(m0, rel=1e-6)
    mom = (p.mass[:, None] * p.vel).sum(0)
    np.testing.assert_allclose(mom, p0, atol=1e-5)


@pytest.mark.parametrize("backend", ["jnp", "pallas", "pm", "p3m"])
def test_long_run_with_gravity(backend):
    """Self-gravitating dense cluster: merges happen on every backend,
    mass is conserved, and the gm source row tracks G*mass throughout."""
    cfg = (dataclasses.replace(MERGE, pm_grid=64)
           if backend == "p3m" else MERGE)
    w = _dense_cluster(cfg)
    n = 64
    m0 = float(np.asarray(w.particles.mass).sum())
    w.update(1e-3, 40, backend=backend)
    p = w.particles
    assert (p.mass > 0).sum() < n               # merges actually happened
    assert float(p.mass.sum()) == pytest.approx(m0, rel=1e-5)
    assert np.isfinite(p.pos).all() and np.isfinite(p.vel).all()
    # gm row stays consistent with the merged masses
    gm = np.asarray(w.gm)[:w.mass_len]
    np.testing.assert_allclose(gm, 10.0 * np.asarray(p.mass)[:w.mass_len],
                               rtol=1e-6)


def test_tracers_never_merge():
    w = _world([[0.0, 0.0], [0.3, 0.0], [0.6, 0.0]],
               mass=[4.0, 0.0, 0.0], radius=[0.7, 0.5, 0.5])
    w.update(DT, 2, backend="jnp")
    p = w.particles
    assert p.mass[0] == pytest.approx(4.0)      # nothing absorbed
    assert (p.mass[1:] == 0.0).all()


def test_p3m_rejected_only_for_stale_bins():
    """p3m + merging works at rebin interval 1 (bins rebuilt from carried
    gm/radius every substep); only p3m_rebin_interval > 1 — genuinely stale
    frozen cell blocks — is rejected (round-4 narrowing, VERDICT r3 #3)."""
    stale = dataclasses.replace(MERGE, p3m_rebin_interval=4)
    w = _world([[0.0, 0.0], [50.0, 0.0]], mass=[5.0, 3.0],
               radius=[0.7, 0.7], config=stale)
    with pytest.raises(ValueError, match="merge_collisions"):
        w.update(DT, 1, backend="p3m")


def test_p3m_merging_matches_jnp_at_rebin_1():
    """Two touching bodies merge identically under p3m and jnp (the merge
    pass is backend-independent; the p3m force difference at mesh scale
    cannot flip a contact event), and the carried gm threads into the
    per-substep bin rebuild — masses/gm stay consistent after the merge."""
    cfg = dataclasses.replace(MERGE, pm_grid=64)

    def mk():
        return _world([[0.0, 0.0], [1.0, 0.0], [40.0, 40.0]],
                      mass=[5.0, 3.0, 2.0], radius=[0.7, 0.7, 0.5],
                      config=cfg)

    wa, wb = mk(), mk()
    wa.update(DT, 3, backend="jnp")
    wb.update(DT, 3, backend="p3m")
    pa, pb = wa.particles, wb.particles
    np.testing.assert_allclose(pb.mass, pa.mass)      # same merge outcome
    assert pa.mass[0] == pytest.approx(8.0) and pa.mass[1] == 0.0
    # gm row tracks the merged masses on the p3m path
    gm = np.asarray(wb.gm)[: wb.mass_len]
    np.testing.assert_allclose(gm, 10.0 * np.asarray(pb.mass)[: wb.mass_len],
                               rtol=1e-6)
    # post-merge kinematics agree to p3m mesh tolerance
    np.testing.assert_allclose(pb.pos, pa.pos, atol=2e-3)
    np.testing.assert_allclose(pb.vel, pa.vel, atol=2e-3)


def test_merge_factor_validation():
    with pytest.raises(ValueError, match="merge_factor"):
        dataclasses.replace(TINY, merge_factor=0.0)


def test_trajectory_capture_merges_too():
    """--traj style capture (record_trajectory) applies the same
    substep-then-merge loop; the final state matches plain update."""
    from nbody_tpu.trajectory import record_trajectory

    a = _dense_cluster(MERGE)
    b = _dense_cluster(MERGE)
    traj = record_trajectory(a, 1e-3, frames=8, steps_per_frame=5,
                             backend="jnp")
    b.update(1e-3, 40, backend="jnp")
    assert traj.shape[0] == 8
    np.testing.assert_allclose(np.asarray(a.particles.mass),
                               np.asarray(b.particles.mass), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.particles.pos),
                               np.asarray(b.particles.pos), atol=1e-5)
    assert (np.asarray(a.particles.mass) > 0).sum() < 64


def test_cli_merge_flag(tmp_path):
    from nbody_tpu.app import main
    from nbody_tpu.utils.checkpoint import load_world

    state = str(tmp_path / "m.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "3",
          "--merge", "--save", state])
    w, _ = load_world(state)
    assert w.config.merge_collisions and w.config.merge_factor == 1.0
    # resume inherits the merging config without re-passing the flag
    s2 = str(tmp_path / "m2.npz")
    main(["run", "--state", state, "--steps", "1", "--save", s2])
    w2, _ = load_world(s2)
    assert w2.config.merge_collisions


def test_sharded_default_backend_supports_merging():
    # merging on meshes landed (see the sharded section below); the default
    # backend resolution must pick a merge-capable backend
    from nbody_tpu.parallel import ShardedWorld, make_mesh

    scene = nb.make_galaxies(250, 1, seed=5)
    sw = ShardedWorld(scene, make_mesh(4), config=MERGE)
    assert sw.force_backend in ("jnp", "pallas", "pallas_ring", "pm")
    sw.update(DT, 1)
    assert np.isfinite(np.asarray(sw.particles.pos)).all()


def test_multi_tile_chunked_merge_pass():
    """M=1100 massive bodies (not a multiple of the 512 chunk): the padded
    multi-tile path must find cross-tile contacts and conserve exactly.
    Guards the lax.map tiling and the chunk padding (the unpadded fallback
    used to materialize an (M, M, 2) cube for any M % 512 != 0)."""
    cfg = dataclasses.replace(MERGE, g=1e-12)
    rng = np.random.default_rng(7)
    n = 1100
    w = _world(rng.uniform(-14, 14, (n, 2)),      # dense: many overlaps
               mass=rng.uniform(0.5, 2.0, n),
               radius=np.full(n, 0.4),
               vel=rng.normal(0, 0.2, (n, 2)),
               config=cfg)
    m0 = float(np.asarray(w.particles.mass).sum())
    p0 = (np.asarray(w.particles.mass)[:, None]
          * np.asarray(w.particles.vel)).sum(0)
    w.update(0.02, 10, backend="jnp")
    p = w.particles
    merged = n - int((p.mass > 0).sum())
    assert merged > 20                            # plenty of real merges
    assert float(p.mass.sum()) == pytest.approx(m0, rel=1e-6)
    np.testing.assert_allclose((p.mass[:, None] * p.vel).sum(0), p0,
                               atol=2e-4)
    # explicit cross-tile pair: indices 100 (tile 0) and 700 (tile 1)
    from nbody_tpu.ops.collisions import merge_pass
    import jax.numpy as jnp
    pos = np.zeros((1100, 2), np.float32)
    pos[:, 0] = np.arange(1100) * 100.0           # all isolated...
    pos[700] = pos[100] + 0.1                     # ...except this pair
    mass = np.ones(1100, np.float32); mass[700] = 2.0
    rad = np.full(1100, 0.4, np.float32)
    out = merge_pass(jnp.asarray(pos), jnp.zeros((1100, 2)),
                     jnp.asarray(rad), jnp.asarray(mass),
                     10.0 * jnp.asarray(mass), factor=1.0, g=10.0,
                     chunk=512)
    om = np.asarray(out[3])
    assert om[700] == pytest.approx(3.0) and om[100] == 0.0


def test_auto_resolution_is_merge_aware():
    from nbody_tpu.world import AUTO_P3M_MIN_PAIRS, resolve_backend

    big = int(np.sqrt(AUTO_P3M_MIN_PAIRS)) * 2
    assert resolve_backend("auto", big, big) == "p3m"
    # rebin=1 (default): p3m is merge-capable (per-substep bin rebuilds)
    assert resolve_backend("auto", big, big, merging=True) == "p3m"
    # rebin>1: frozen bins conflict with mid-loop mass changes -> pm
    assert resolve_backend("auto", big, big, merging=True,
                           rebin_interval=8) == "pm"
    assert resolve_backend("auto", 1000, 500, merging=True) == "jnp"


def test_invariant_validator_understands_merged_worlds():
    """validate_world_invariants accepts the weakened partition (zero-mass
    absorbed rows inside the prefix) for merging worlds, still rejects it
    for plain ones."""
    from nbody_tpu.utils.checks import validate_world_invariants

    w = _world([[0.0, 0.0], [1.0, 0.0]], mass=[5.0, 3.0], radius=[0.7, 0.7])
    w.update(DT, 1, backend="jnp")
    assert float(w.particles.mass[1]) == 0.0      # merged: hole in prefix
    validate_world_invariants(w)                  # must not raise

    plain = _world([[0.0, 0.0], [50.0, 0.0]], mass=[5.0, 3.0],
                   radius=[0.7, 0.7], config=TINY)
    validate_world_invariants(plain)              # intact world still fine


# ---- sharded merging (the collective form of the same pass) ----------------

def _sharded(pos, mass, radius, n_dev=2, force_backend="jnp", vel=None):
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    p = make_particles(
        np.asarray(pos, np.float32),
        vel=None if vel is None else np.asarray(vel, np.float32),
        mass=np.asarray(mass, np.float32),
        radius=np.asarray(radius, np.float32),
    )
    return ShardedWorld(p, make_mesh(n_dev), config=MERGE,
                        force_backend=force_backend)


@pytest.mark.parametrize("force_backend",
                         ["jnp", "pallas", "pallas_ring", "pm"])
def test_sharded_two_body_merge(force_backend):
    sw = _sharded([[0.0, 0.0], [1.0, 0.0]], mass=[5.0, 3.0],
                  radius=[0.7, 0.7], force_backend=force_backend)
    sw.update(DT, 1)
    p = sw.particles
    assert p.mass[0] == pytest.approx(8.0) and p.mass[1] == 0.0
    assert p.pos[0, 0] == pytest.approx(3.0 / 8.0, abs=1e-4)
    assert p.radius[0] == pytest.approx((2 * 0.7**3) ** (1 / 3), rel=1e-5)


def test_sharded_accretion_matches_single_chip():
    # 20 substeps of a dense single galaxy: the same merges must happen in
    # the same order as the single-chip pass (exact mass parity)
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(300, 1, seed=8)
    w = nb.create_world(scene, config=MERGE)
    w.update(0.01, 20, backend="jnp")
    sw = ShardedWorld(scene, make_mesh(4), config=MERGE, force_backend="jnp")
    sw.update(0.01, 20)
    np.testing.assert_array_equal(np.asarray(sw.particles.mass),
                                  np.asarray(w.particles.mass))
    ref = np.asarray(w.particles.pos)
    got = np.asarray(sw.particles.pos)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)
    assert (np.asarray(w.particles.mass) == 0).sum() > 50  # merges happened


def test_sharded_merge_record_and_adaptive():
    # capture and adaptive run through the merging carries
    sw = _sharded([[0.0, 0.0], [1.0, 0.0], [10.0, 10.0]],
                  mass=[5.0, 3.0, 0.0], radius=[0.7, 0.7, 0.5], n_dev=2)
    traj = sw.record(DT, frames=3, steps_per_frame=2)
    assert traj.shape == (3, 3, 2)
    assert sw.particles.mass[0] == pytest.approx(8.0)
    sw2 = _sharded([[0.0, 0.0], [1.0, 0.0], [10.0, 10.0]],
                   mass=[5.0, 3.0, 0.0], radius=[0.7, 0.7, 0.5], n_dev=2)
    n = sw2.update_adaptive(0.01, dt_max=5e-3)
    assert n >= 2
    assert sw2.particles.mass[0] == pytest.approx(8.0)
    assert np.isfinite(np.asarray(sw2.particles.pos)).all()


def test_sharded_merge_p3m_rejected():
    with pytest.raises(ValueError, match="not supported"):
        _sharded([[0.0, 0.0], [1.0, 0.0]], mass=[1.0, 1.0],
                 radius=[0.5, 0.5], force_backend="p3m")
