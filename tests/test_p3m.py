"""P³M solver (ops/p3m_forces.py) — beyond-reference accurate-at-all-ranges
backend. Force-split correctness (mesh taper + exact PP + exact-core rows),
error envelopes vs the direct sum, cell-table semantics, World integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu import forces
from nbody_tpu.ops.p3m_forces import (
    _cell_pack, _to_blocks, p3m_acc, p3m_cell_overflow,
)
from nbody_tpu.ops.pm_forces import pm_acc
from nbody_tpu.types import SimConfig


def _scene_errors(backend_acc):
    """Per-particle relative force error vs the exact direct sum."""
    scene = nb.make_galaxies(2048, 2, seed=11037)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    src = pos[: w.mass_len]
    gm = w.gm[: w.mass_len]
    ref = np.asarray(forces.direct_sum_acc(pos, rad, src, gm, precise=True))
    got = np.asarray(backend_acc(pos, rad, src, gm))
    mag = np.hypot(ref[:, 0], ref[:, 1])
    return np.hypot(*(got - ref).T) / (mag + 0.01 * mag.mean())


def test_error_envelope_and_beats_pm():
    # The PP correction must collapse the near-field error tail that plain
    # PM leaves (close pairs smoothed to the global softening).
    err_pm = _scene_errors(
        lambda pos, rad, src, gm: pm_acc(pos, src, gm, 2.0, grid=256))
    err_p3m = _scene_errors(
        lambda pos, rad, src, gm: p3m_acc(pos, rad, src, gm, 2.0, grid=256))
    assert np.median(err_p3m) < 2e-3
    assert np.percentile(err_p3m, 99) < 5e-2
    assert err_p3m.max() < 0.12
    # tail at least 3x better than PM on the same grid
    assert err_p3m.max() < err_pm.max() / 3.0


def test_rc_widening_shrinks_tail():
    e4 = _scene_errors(
        lambda pos, rad, src, gm: p3m_acc(pos, rad, src, gm, 2.0, grid=256,
                                          rc_cells=4, cell_capacity=192))
    e8 = _scene_errors(
        lambda pos, rad, src, gm: p3m_acc(pos, rad, src, gm, 2.0, grid=256,
                                          rc_cells=8, cell_capacity=192))
    assert e8.max() < e4.max()


def test_close_pair_is_reference_exact():
    # Two bodies one cell apart: mesh alone smears them; P³M's PP stage must
    # restore the reference force law including the per-target radius
    # softening (sim_cpu.c:176) to fp32 accuracy.
    pos = jnp.array([[0.0, 0.0], [3.0, 0.0]], jnp.float32)
    rad = jnp.array([2.0, 5.0], jnp.float32)
    gm = jnp.array([100.0, 50.0], jnp.float32)
    # spread bystanders so the adaptive box (and h) is macroscopic
    far = jnp.array([[-500.0, -500.0], [500.0, 500.0]], jnp.float32)
    allpos = jnp.concatenate([pos, far])
    allrad = jnp.concatenate([rad, jnp.array([1.0, 1.0], jnp.float32)])
    allgm = jnp.concatenate([gm, jnp.array([1.0, 1.0], jnp.float32)])
    ref = np.asarray(forces.direct_sum_acc(allpos, allrad, allpos, allgm,
                                           precise=True))
    got = np.asarray(p3m_acc(allpos, allrad, allpos, allgm, 2.0, grid=128,
                             exact_targets=0))
    # the close pair dominates rows 0-1; agreement must be ~mesh-residual of
    # the far bystanders, i.e. tight
    np.testing.assert_allclose(got[:2], ref[:2], rtol=2e-3, atol=1e-5)


def test_cell_table_keeps_heaviest_and_reports_overflow():
    # 20 sources in one cell, capacity 8: the 8 heaviest stay, 12 dropped.
    n = 20
    pos = jnp.stack([jnp.linspace(0.0, 1.0, n), jnp.zeros(n)], axis=1)
    gm = jnp.arange(1.0, n + 1.0, dtype=jnp.float32)  # heaviest = last
    lo = jnp.array([0.0, 0.0], jnp.float32)
    order, cid, rank, counts = _cell_pack(pos, lo, 1.0 / 100.0, 4,
                                          priority=gm)
    blocks = _to_blocks(gm[order], cid, rank, 4, 8)
    kept = np.asarray(blocks[0, 0])
    kept = kept[kept > 0]
    assert len(kept) == 8
    # heaviest-first within the cell: gm 13..20 survive, 1..12 dropped
    assert set(kept) == set(float(v) for v in range(13, 21))
    # overflow counter: 20 near-coincident sources (one far point sets the
    # adaptive box scale, so the cluster shares one cell), capacity 8
    pos2 = jnp.concatenate(
        [pos * 1e-3, jnp.array([[100.0, 100.0]], jnp.float32)])
    gm2 = jnp.concatenate([gm, jnp.array([1.0], jnp.float32)])
    ov = p3m_cell_overflow(pos2, gm2, grid=64, rc_cells=16, cell_capacity=8)
    assert int(ov) == 12


def test_overflow_degrades_gracefully():
    # capacity too small for a dense scene: still finite, still better than
    # or comparable to plain PM (dropped lightest pairs revert to mesh-only)
    err = _scene_errors(
        lambda pos, rad, src, gm: p3m_acc(pos, rad, src, gm, 2.0, grid=256,
                                          cell_capacity=8))
    assert np.all(np.isfinite(err))
    assert np.median(err) < 5e-3


def test_world_p3m_backend_short_trajectory_matches_jnp():
    # small grid/capacity: PP cost is gc²·9·cap² regardless of occupancy,
    # and CI runs on one CPU core (production sizing notes in SCALING.md)
    scene = nb.make_galaxies(1500, 1, seed=5)
    cfg = SimConfig(tile_targets=128, pm_grid=256, p3m_cell_capacity=32)
    w_ref = nb.create_world(scene, config=cfg)
    w_p3m = nb.create_world(scene, config=cfg)
    w_ref.update(0.01, 20, backend="jnp")
    w_p3m.update(0.01, 20, backend="p3m")
    ref = np.asarray(w_ref.particles.pos)
    got = np.asarray(w_p3m.particles.pos)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / scale < 1e-4


def test_world_p3m_massless_tracers_move_and_stay_finite():
    scene = nb.make_galaxies(800, 2, seed=9)
    w = nb.create_world(scene, config=SimConfig(
        tile_targets=128, pm_grid=128, p3m_cell_capacity=32))
    before = np.asarray(w.particles.pos).copy()
    w.update(0.05, 10, backend="p3m")
    after = np.asarray(w.particles.pos)
    assert np.all(np.isfinite(after))
    assert np.any(np.abs(after - before) > 0)


def test_p3m_rollout_gradients_match_direct():
    # p3m is scatter/gather/FFT/sort jnp — jax.grad flows natively; with the
    # exact PP correction its gradient should track the direct solver's even
    # tighter than plain PM's
    import jax
    from nbody_tpu.autodiff import rollout

    scene = nb.make_galaxies(300, 1, seed=2)
    w = nb.create_world(scene)
    host = w.particles
    pos = jnp.asarray(host.pos)
    vel = jnp.asarray(host.vel)
    mass = jnp.asarray(host.mass)
    radius = jnp.asarray(host.radius)

    def loss(p0, backend):
        p, v = rollout(p0, vel, mass, radius, 0.01, n_steps=5,
                       mass_len=w.mass_len, backend=backend, pm_grid=128)
        return jnp.sum(p**2)

    g_p3m = np.asarray(jax.grad(lambda p: loss(p, "p3m"))(pos))
    assert np.all(np.isfinite(g_p3m))
    g_ref = np.asarray(jax.grad(lambda p: loss(p, "jnp"))(pos))
    scale = np.abs(g_ref).max()
    err = np.percentile(np.abs(g_p3m - g_ref).max(axis=1) / scale, 95)
    assert err < 2e-2, f"p95 gradient mismatch {err:.3f}"


def test_sharded_p3m_matches_single_device():
    """Collective P³M (psum'd tapered mass grid + all-gathered source cell
    blocks reduced to the global heaviest-cap per cell + psum'd exact-core
    rows) must reproduce the single-device p3m trajectory: the merged panel
    reduction makes the capacity semantics identical, so only fp32 summation
    order differs."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(1024, 2, seed=11037)
    cfg = SimConfig(tile_targets=64, pm_grid=256, p3m_cell_capacity=32)
    w = nb.create_world(scene, config=cfg, default_backend="p3m")
    w.update(0.01, 3)
    b = np.asarray(w.particles.pos)
    scale = np.abs(b).max()
    for d in (2, 8):
        sw = ShardedWorld(scene, make_mesh(d), config=cfg,
                          force_backend="p3m")
        sw.update(0.01, 3)
        a = np.asarray(sw.particles.pos)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-6)


def test_sharded_composite_bins_bit_match_plain():
    """The collective composite pack/unpack indices (p3m_bins_collective
    composite=True — used when p3m_rebin_interval > 1) must reproduce the
    plain collective forms from the same fresh bins: same slots, same drop
    rule (the cross-device global-rank mask folds into the cached unpack
    mask). One force evaluation, both flags, under shard_map on 4 devices.
    The two flags compile different gather structures, so XLA's fma/fusion
    choices differ — equality is up to fp32 contraction-order noise (a
    drop-rule bug would be wrong by whole pair forces, not 1e-6)."""
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.parallel.sharding import AXIS, make_mesh
    from nbody_tpu.ops.p3m_forces import (
        p3m_acc_collective_from_bins, p3m_bins_collective)
    from nbody_tpu.types import G

    d = 4
    mesh = make_mesh(d)
    scene = nb.make_galaxies(1024, 2, seed=3)
    pos = jnp.asarray(scene.pos)
    rad = jnp.asarray(scene.radius)
    gm = jnp.asarray(G * scene.mass)
    kw = dict(grid=256, rc_cells=4, cell_capacity=16, exact_targets=16,
              axis_name=AXIS, n_devices=d)

    def run(composite):
        def body(p, r, g):
            bins = p3m_bins_collective(p, r, g, composite=composite, **kw)
            return p3m_acc_collective_from_bins(bins, p, r, g, 2.0, **kw)

        return np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(AXIS), P(AXIS), P(AXIS)),
            out_specs=P(AXIS)))(pos, rad, gm))

    a, b = run(False), run(True)
    scale = np.abs(a).max()
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-6)


def test_sharded_p3m_exact_cores_match_direct():
    # the psum'd exact-core override: forces on the largest-radius targets
    # (galaxy cores) must be direct-sum exact on the sharded path too
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(512, 2, seed=7)
    cfg = SimConfig(tile_targets=64, pm_grid=128, p3m_cell_capacity=32,
                    p3m_exact_targets=8)
    w = nb.create_world(scene, config=cfg)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    ref = np.asarray(forces.direct_sum_acc(
        pos, rad, pos[: w.mass_len], w.gm[: w.mass_len], precise=False))

    sw = ShardedWorld(scene, make_mesh(4), config=cfg, force_backend="p3m")
    # after one Euler substep, .acc holds the force evaluated at the
    # initial positions
    sw.update(0.01, 1)
    acc = np.asarray(sw.particles.acc)
    big = np.argsort(-np.asarray(rad))[:8]
    scale = np.abs(ref[big]).max()
    np.testing.assert_allclose(acc[big] / scale, ref[big] / scale, atol=1e-5)


def test_sharded_p3m_leapfrog():
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(512, 1, seed=3)
    cfg = SimConfig(tile_targets=64, pm_grid=128, p3m_cell_capacity=32,
                    integrator="leapfrog")
    sw = ShardedWorld(scene, make_mesh(4), config=cfg, force_backend="p3m")
    w = nb.create_world(scene, config=cfg, default_backend="p3m")
    sw.update(0.01, 4)
    w.update(0.01, 4)
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos),
        rtol=3e-4, atol=3e-3)


def test_sharded_p3m_record_and_checkpoint_roundtrip(tmp_path):
    # on-device sharded trajectory capture and the Orbax restore path must
    # both work with the collective p3m backend (full-length gm row layout)
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
    from nbody_tpu.utils.checkpoint import (
        load_sharded_world_orbax, save_world_orbax)

    scene = nb.make_galaxies(512, 1, seed=11)
    cfg = SimConfig(tile_targets=64, pm_grid=128, p3m_cell_capacity=32)
    mesh = make_mesh(4)
    sw = ShardedWorld(scene, mesh, config=cfg, force_backend="p3m")
    traj = sw.record(0.01, frames=3, steps_per_frame=2)
    assert traj.shape == (3, sw.total_len, 2)
    assert np.all(np.isfinite(traj))
    # single-device reference for the same capture
    w = nb.create_world(scene, config=cfg, default_backend="p3m")
    w.update(0.01, 6)
    scale = np.abs(traj[-1]).max()
    np.testing.assert_allclose(
        traj[-1] / scale, np.asarray(w.particles.pos) / scale, atol=2e-6)

    path = str(tmp_path / "ckpt")
    save_world_orbax(path, sw)
    sw2, _ = load_sharded_world_orbax(path, mesh, config=cfg,
                                      force_backend="p3m")
    np.testing.assert_allclose(np.asarray(sw2.particles.pos),
                               np.asarray(sw.particles.pos))
    sw2.update(0.01, 1)  # restored world must still step
    assert np.all(np.isfinite(np.asarray(sw2.particles.pos)))


def test_bins_path_matches_p3m_acc_exactly():
    # p3m_acc_from_bins with fresh bins must be bit-identical to p3m_acc
    # (same structure, same math — the bins are just factored out)
    from nbody_tpu.ops.p3m_forces import p3m_acc_from_bins, p3m_bins

    scene = nb.make_galaxies(1024, 2, seed=11037)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    src = pos[: w.mass_len]
    gm = w.gm[: w.mass_len]
    ref = np.asarray(p3m_acc(pos, rad, src, gm, 2.0, grid=256,
                             cell_capacity=32))

    @jax.jit
    def via_bins(pos, rad, src, gm):
        bins = p3m_bins(pos, rad, src, gm, grid=256, rc_cells=4,
                        exact_targets=64)
        return p3m_acc_from_bins(bins, pos, rad, src, gm, 2.0,
                                 grid=256, rc_cells=4, cell_capacity=32)

    # same graph under one jit -> identical up to fusion-order noise
    got = np.asarray(via_bins(pos, rad, src, gm))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-7)


def test_composite_bins_match_plain_bins_bit_exact():
    """p3m_bins(composite_capacity=cap) adds the one-gather pack/unpack
    index forms (tune_r3e: the permutation gather and the order-restoring
    sort move to bin-build time, paying off when bins are reused across
    substeps). Same bins, same math — the accelerations must be BIT
    identical to the plain-bins path, overflowing cells included."""
    from nbody_tpu.ops.p3m_forces import p3m_acc_from_bins, p3m_bins

    scene = nb.make_galaxies(1024, 2, seed=11037)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    src = pos[: w.mass_len]
    gm = w.gm[: w.mass_len]
    kw = dict(grid=256, rc_cells=4, exact_targets=64)
    # cap=8 forces real overflow so the composite ok-masks are exercised
    for cap in (8, 32):
        plain = p3m_acc_from_bins(
            p3m_bins(pos, rad, src, gm, **kw), pos, rad, src, gm, 2.0,
            grid=256, rc_cells=4, cell_capacity=cap)
        comp = p3m_acc_from_bins(
            p3m_bins(pos, rad, src, gm, composite_capacity=cap, **kw),
            pos, rad, src, gm, 2.0, grid=256, rc_cells=4,
            cell_capacity=cap)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(comp))


def test_rebin_interval_error_is_bounded():
    # rebin=1 is the exact (default) behavior; rebin=4 may only miss pairs
    # that crossed the taper-suppressed rc boundary since the last rebin —
    # the trajectory must track the exact one to a small relative error
    scene = nb.make_galaxies(1500, 1, seed=5)
    base = dict(tile_targets=128, pm_grid=256, p3m_cell_capacity=32)
    w1 = nb.create_world(scene, config=SimConfig(**base))
    w4 = nb.create_world(scene, config=SimConfig(**base,
                                                 p3m_rebin_interval=4))
    w1.update(0.01, 24, backend="p3m")
    w4.update(0.01, 24, backend="p3m")
    a = np.asarray(w1.particles.pos)
    b = np.asarray(w4.particles.pos)
    scale = np.abs(a).max()
    err = np.abs(a - b).max() / scale
    assert err < 2e-4, f"rebin drift error {err:.2e}"
    # and the first substep after each rebin is exactly aligned in structure:
    # a fresh-rebin run of k substeps starts identical to the exact run
    w1b = nb.create_world(scene, config=SimConfig(**base))
    w4b = nb.create_world(scene, config=SimConfig(**base,
                                                  p3m_rebin_interval=4))
    w1b.update(0.01, 1, backend="p3m")
    w4b.update(0.01, 1, backend="p3m")
    np.testing.assert_array_equal(np.asarray(w1b.particles.pos),
                                  np.asarray(w4b.particles.pos))


def test_sharded_p3m_rebin_tracks_exact():
    """Sharded p3m with p3m_rebin_interval > 1: the frozen collective bins
    (orders, merge selection, count offsets, exact-core rows) are carried
    across substeps inside one shard_map loop; the trajectory must track
    the exact sharded run within the same drift bound as single-device."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(768, 1, seed=3)
    base = dict(tile_targets=64, pm_grid=128, p3m_cell_capacity=32)
    sw1 = ShardedWorld(scene, make_mesh(4), config=SimConfig(**base),
                       force_backend="p3m")
    sw4 = ShardedWorld(scene, make_mesh(4),
                       config=SimConfig(**base, p3m_rebin_interval=4),
                       force_backend="p3m")
    sw1.update(0.01, 12)
    sw4.update(0.01, 12)
    a = np.asarray(sw1.particles.pos)
    b = np.asarray(sw4.particles.pos)
    scale = np.abs(a).max()
    assert np.max(np.abs(a - b)) / scale < 2e-4
    # and the sharded rebin run still matches the SINGLE-DEVICE rebin run
    w4 = nb.create_world(scene, config=SimConfig(**base,
                                                 p3m_rebin_interval=4),
                         default_backend="p3m")
    w4.update(0.01, 12)
    c = np.asarray(w4.particles.pos)
    np.testing.assert_allclose(b / scale, c / scale, atol=2e-6)


def test_pp_pallas_kernel_matches_jnp_path():
    """The fused Pallas PP kernel (interpret mode off-TPU) must reproduce
    the XLA neighbors+map formulation on the same packed blocks — same
    math, different execution."""
    from nbody_tpu.ops.p3m_forces import (
        _cell_pack, _gather_blocks, _pack_source_blocks)
    from nbody_tpu.ops.p3m_pallas import _pp_blocks_jnp, pp_blocks
    from nbody_tpu.ops.pm_forces import _bounds, _box

    scene = nb.make_galaxies(600, 2, seed=11037)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    src = pos[: w.mass_len]
    gm = w.gm[: w.mass_len]
    grid, rc_cells, cap = 128, 4, 16
    gc = grid // rc_cells
    mn, mx = _bounds(pos, src, gm, None)
    lo, h = _box(mn, mx, grid)
    rc = rc_cells * h
    cell = (grid * h) / gc
    sx, sy, sg = _pack_source_blocks(src, gm, lo, 1.0 / cell, gc, cap)
    order_t, _, _, counts_t = _cell_pack(pos, lo, 1.0 / cell, gc)
    pt = pos[order_t]
    tx, ty, tr = _gather_blocks(
        [(pt[:, 0], 0.0), (pt[:, 1], 0.0), (rad[order_t], 1.0)],
        counts_t, gc, cap)

    for precise in (False, True):
        ref = np.asarray(_pp_blocks_jnp(tx, ty, tr, sx, sy, sg, rc, 4.0,
                                        precise=precise))
        got = np.asarray(pp_blocks(tx, ty, tr, sx, sy, sg, rc, 4.0,
                                   precise=precise, interpret=True))
        scale = max(np.abs(ref).max(), 1e-30)
        # the kernel multiplies by a precomputed 1/rc where the jnp path
        # divides by rc: pairs exactly at the taper boundary can round to
        # slightly different u, so a handful of near-rc pairs differ at
        # ~1e-5 of scale (2/32k here) — everything else is fp32-identical
        np.testing.assert_allclose(got / scale, ref / scale, atol=5e-5)

    # gradient path: custom-VJP backward (jnp recompute) stays finite and
    # matches the pure-jnp gradient
    def loss_k(tx_):
        return jnp.sum(pp_blocks(tx_, ty, tr, sx, sy, sg, rc, 4.0,
                                 interpret=True) ** 2)

    def loss_j(tx_):
        return jnp.sum(_pp_blocks_jnp(tx_, ty, tr, sx, sy, sg, rc, 4.0,
                                      precise=False) ** 2)

    gk = np.asarray(jax.grad(loss_k)(tx))
    gj = np.asarray(jax.grad(loss_j)(tx))
    gs = max(np.abs(gj).max(), 1e-30)
    # the cotangent (2*pp) inherits the near-rc boundary rounding of the
    # forward; this asserts the VJP plumbing, not boundary-pair rounding
    np.testing.assert_allclose(gk / gs, gj / gs, atol=1e-3)


def test_config_validation():
    with pytest.raises(ValueError, match="p3m_rc_cells"):
        SimConfig(p3m_rc_cells=1)
    with pytest.raises(ValueError, match="p3m_cell_capacity"):
        SimConfig(p3m_cell_capacity=4)
    with pytest.raises(ValueError, match="p3m_exact_targets"):
        SimConfig(p3m_exact_targets=-1)
    with pytest.raises(ValueError, match="p3m_rebin_interval"):
        SimConfig(p3m_rebin_interval=0)


def _pp_stage(pos, radius, gm, *, grid=256, rc_cells=4, cap=64, chunk=None,
              compact=None):
    """The isolated PP correction stage, as p3m_acc_from_bins wires it."""
    from nbody_tpu.ops.p3m_forces import _pack_source_blocks, _pp_apply
    from nbody_tpu.ops.pm_forces import _bounds, _box

    sg = jax.lax.stop_gradient
    all_min, all_max = _bounds(sg(pos), sg(pos), sg(gm), None)
    lo, h = _box(all_min, all_max, grid)
    gc = grid // rc_cells
    inv_c = gc / (grid * h)
    blocks = _pack_source_blocks(pos, gm, lo, inv_c, gc, cap)
    order_t, cid_t, rank_t, counts_t = _cell_pack(pos, lo, inv_c, gc)
    return _pp_apply(pos, radius, blocks, order_t, cid_t, rank_t, counts_t,
                     rank_t, gc, cap, rc_cells * h, jnp.float32(4.0), False,
                     chunk=chunk, compact=compact)


@pytest.mark.smoke
def test_pp_chunked_map_bit_matches_row_map():
    """The occupancy-skipping chunked lax.map (chunk=B) must be bit-identical
    to the row map: the lax.cond skip only ever drops cells whose correction
    is exactly zero (no targets, or all-zero candidate gm)."""
    scene = nb.make_galaxies(4096, 3, seed=7)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    gm = jnp.zeros(w.total_len).at[: w.mass_len].set(w.gm[: w.mass_len])

    ref = np.asarray(_pp_stage(pos, rad, gm))
    for b in (16, 64):
        got = np.asarray(_pp_stage(pos, rad, gm, chunk=b))
        np.testing.assert_array_equal(got, ref)
    # chunk not dividing gc^2 falls back to the row map — still exact
    got = np.asarray(_pp_stage(pos, rad, gm, chunk=7))
    np.testing.assert_array_equal(got, ref)


def test_world_pp_chunk_trajectory_matches_off():
    """End-to-end: a p3m world with the default pp_chunk must track the
    pp_chunk=0 trajectory to fp32 fusion noise, including the frozen-bins
    rebin path. (The skip itself contributes exactly zero — the chunked
    _pp_apply is bit-identical, see test_pp_chunked_map_bit_matches_row_map
    — but the two configs are different XLA executables, whose fusion
    differs by ~1 ulp per substep elsewhere in the update.)"""
    scene = nb.make_galaxies(2048, 2, seed=5)
    outs = []
    for pp_chunk in (64, 0):
        for rebin in (1, 4):
            cfg = SimConfig(p3m_pp_chunk=pp_chunk, pm_grid=256,
                            p3m_rebin_interval=rebin)
            w = nb.create_world(scene, config=cfg, default_backend="p3m")
            w.update(0.01, 8)
            outs.append(np.asarray(w.state.pos))
    scale = np.abs(outs[2]).max()
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5 * scale)  # rebin=1
    np.testing.assert_allclose(outs[1], outs[3], atol=1e-5 * scale)  # rebin=4


def test_pp_chunked_map_gradients_match():
    """Reverse-mode AD through the chunked map (cond of checkpointed row)
    must agree with the row-map gradients."""
    scene = nb.make_galaxies(512, 2, seed=3)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    gm = jnp.zeros(w.total_len).at[: w.mass_len].set(w.gm[: w.mass_len])

    def loss(p, chunk):
        return jnp.sum(_pp_stage(p, rad, gm, grid=64, chunk=chunk) ** 2)

    g_ref = np.asarray(jax.grad(lambda p: loss(p, None))(pos))
    g_chk = np.asarray(jax.grad(lambda p: loss(p, 16))(pos))
    np.testing.assert_allclose(g_chk, g_ref, rtol=1e-5, atol=1e-6)


def test_gather_blocks_equals_scatter_blocks():
    """The production gather-built cell blocks must equal the legacy
    scatter form (_to_blocks) for random occupancy including overflow."""
    from nbody_tpu.ops.p3m_forces import _gather_blocks, _to_blocks

    rng = np.random.default_rng(0)
    gc, cap, n = 4, 3, 50
    cid = np.sort(rng.integers(0, gc * gc, n)).astype(np.int32)
    counts = np.bincount(cid, minlength=gc * gc).astype(np.int32)
    starts = np.cumsum(counts) - counts
    rank = (np.arange(n) - starts[cid]).astype(np.int32)
    vals = rng.normal(size=n).astype(np.float32)

    legacy = np.asarray(_to_blocks(jnp.asarray(vals), jnp.asarray(cid),
                                   jnp.asarray(rank), gc, cap, fill=7.0))
    (got,) = _gather_blocks([(jnp.asarray(vals), 7.0)],
                            jnp.asarray(counts), gc, cap)
    np.testing.assert_array_equal(np.asarray(got), legacy)


def test_public_p3m_acc_accepts_pp_chunk():
    """pp_chunk is a static arg of the jitted public p3m_acc (regression:
    it was added to the signature without static_argnames, so any
    non-None value crashed at trace time)."""
    from nbody_tpu.ops.p3m_forces import p3m_acc

    scene = nb.make_galaxies(1024, 1, seed=9)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    gm = w.gm[: w.mass_len]
    a0 = np.asarray(p3m_acc(pos, rad, pos[: w.mass_len], gm,
                            grid=64, rc_cells=4, cell_capacity=32))
    a1 = np.asarray(p3m_acc(pos, rad, pos[: w.mass_len], gm,
                            grid=64, rc_cells=4, cell_capacity=32,
                            pp_chunk=16))
    scale = np.abs(a0).max() + 1e-30
    assert np.abs(a1 - a0).max() / scale < 1e-6


@pytest.mark.smoke
def test_pp_compact_bit_matches_row_map():
    """Active-cell compaction is exact in BOTH cond arms: with a panel big
    enough for every active cell the compacted map's routed-back blocks are
    bit-identical to the row map (zero-sentinel rows only ever replace
    exactly-zero corrections), and with a panel too small the lax.cond
    falls back to the full chunked map — also bit-identical."""
    scene = nb.make_galaxies(4096, 3, seed=7)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    gm = jnp.zeros(w.total_len).at[: w.mass_len].set(w.gm[: w.mass_len])

    ref = np.asarray(_pp_stage(pos, rad, gm))
    # gc = 64 -> 4096 cells; 1024-row panel comfortably holds the actives
    engaged = np.asarray(_pp_stage(pos, rad, gm, chunk=16, compact=1024))
    np.testing.assert_array_equal(engaged, ref)
    # 16-row panel overflows -> cond picks the full chunked map
    fallback = np.asarray(_pp_stage(pos, rad, gm, chunk=16, compact=16))
    np.testing.assert_array_equal(fallback, ref)
    # compact without chunk, not a multiple of chunk, or >= gc² is ignored
    for chunk, compact in ((None, 1024), (16, 24), (16, 4096)):
        got = np.asarray(_pp_stage(pos, rad, gm, chunk=chunk,
                                   compact=compact))
        np.testing.assert_array_equal(got, ref)


def test_world_pp_compact_trajectory_matches_off():
    """End-to-end: a p3m world with p3m_pp_compact tracks the default
    trajectory to fp32 fusion noise, including the frozen-bins rebin path
    (the compacted map contributes bit-identical corrections; different
    executables fuse ~1 ulp differently elsewhere)."""
    scene = nb.make_galaxies(2048, 2, seed=5)
    outs = []
    for compact in (512, 0):
        for rebin in (1, 4):
            cfg = SimConfig(p3m_pp_chunk=64, p3m_pp_compact=compact,
                            pm_grid=256, p3m_rebin_interval=rebin)
            w = nb.create_world(scene, config=cfg, default_backend="p3m")
            w.update(0.01, 8)
            outs.append(np.asarray(w.state.pos))
    scale = np.abs(outs[2]).max()
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5 * scale)
    np.testing.assert_allclose(outs[1], outs[3], atol=1e-5 * scale)


def test_sharded_p3m_pp_compact_matches_single():
    """The compaction runs per shard inside shard_map (local target counts,
    merged global sources); a compacted sharded world must track the
    single-chip compacted world like the other sharded p3m paths."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(512, 1, seed=3)
    cfg = SimConfig(tile_targets=64, pm_grid=128, p3m_cell_capacity=32,
                    p3m_pp_chunk=16, p3m_pp_compact=256)
    sw = ShardedWorld(scene, make_mesh(4), config=cfg, force_backend="p3m")
    w = nb.create_world(scene, config=cfg, default_backend="p3m")
    sw.update(0.01, 4)
    w.update(0.01, 4)
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos),
        rtol=3e-4, atol=3e-3)


def test_pp_compact_gradients_match():
    """Reverse-mode AD through the compaction (cond + routed gathers) must
    agree with the row-map gradients when the compact arm engages."""
    scene = nb.make_galaxies(512, 2, seed=3)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    rad = w.state.radius[: w.total_len]
    gm = jnp.zeros(w.total_len).at[: w.mass_len].set(w.gm[: w.mass_len])

    def loss(p, chunk, compact):
        return jnp.sum(
            _pp_stage(p, rad, gm, grid=64, chunk=chunk, compact=compact) ** 2)

    # panel 128 > the scene's ~67 active cells, so the compact arm engages
    # (the fallback arm's grads are covered by the chunk tests)
    g_ref = np.asarray(jax.grad(lambda p: loss(p, None, None))(pos))
    g_cmp = np.asarray(jax.grad(lambda p: loss(p, 16, 128))(pos))
    np.testing.assert_allclose(g_cmp, g_ref, rtol=1e-5, atol=1e-6)


def test_pp_compact_config_validation():
    with pytest.raises(ValueError, match="p3m_pp_compact"):
        SimConfig(p3m_pp_compact=-1)
    with pytest.raises(ValueError, match="requires p3m_pp_chunk"):
        SimConfig(p3m_pp_chunk=0, p3m_pp_compact=512)
    with pytest.raises(ValueError, match="multiple of p3m_pp_chunk"):
        SimConfig(p3m_pp_chunk=64, p3m_pp_compact=96)
