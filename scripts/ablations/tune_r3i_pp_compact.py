#!/usr/bin/env python
"""Round-3 PP occupancy experiment #2: ACTIVE-CELL COMPACTION.

The chunk-skip (tune_r3g, shipped as p3m_pp_chunk) recovers ~7.4 ms of the
~17 ms pair math at N=1M by skipping empty chunks inside the sequential
map — bounded by chunk granularity (a chunk with one active cell pays for
all of them). This experiment compacts ACTIVE CELLS ONLY into a static
a_cap-row panel (argsort actives-first + per-channel row gathers), runs
the pair map over those rows alone, and routes results back with one
remapped gather (inactive cells read a zero sentinel row). Exactness
fallback in a production form would be `lax.cond(n_active <= a_cap,
compact, full)` — this script measures the compact arm and the occupancy
so we know whether the fast path would engage on real scenes.

Measured costs include the compaction gathers AND the route-back remap.

Run: python -u scripts/ablations/tune_r3i_pp_compact.py [scene_idx [a_caps...]]
(on TPU; one scene ~5-10 min including compiles)
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.galaxy import make_galaxies
from nbody_tpu.ops.p3m_forces import _cell_pack, _pack_source_blocks, _pp_apply
from nbody_tpu.ops.pm_forces import _bounds, _box
from nbody_tpu.types import DTYPE

K = 8
GRID, RC = 512, 4
GC = GRID // RC
CAP = 96
CHUNK = 16  # sub-map granularity inside the compacted panel


def kloop(piece, x, k=K):
    @jax.jit
    def run(x):
        def body(i, s):
            return s + piece(x + 1e-18 * s).sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    float(run(x)); t0 = time.perf_counter(); float(run(x))
    return (time.perf_counter() - t0) * 1e3 / k


def _stage_inputs(pos, radius, gm):
    sg = jax.lax.stop_gradient
    all_min, all_max = _bounds(sg(pos), sg(pos), sg(gm), None)
    lo, h = _box(all_min, all_max, GRID)
    rc = RC * h
    inv_c = GC / (GRID * h)
    return lo, inv_c, rc


def pp_full(pos, radius, gm, lo, inv_c, rc, chunk=None):
    blocks = _pack_source_blocks(pos, gm, lo, inv_c, GC, CAP)
    order_t, cid_t, rank_t, counts_t = _cell_pack(pos, lo, inv_c, GC)
    return _pp_apply(pos, radius, blocks, order_t, cid_t, rank_t,
                     counts_t, rank_t, GC, CAP, rc, jnp.float32(4.0),
                     False, chunk=chunk)


def pp_compact(pos, radius, gm, lo, inv_c, rc, a_cap):
    """Compacted pair map: same math as _pp_apply's row body over only the
    a_cap compacted rows, then one remap-gather back to block layout and
    the standard unpack."""
    from nbody_tpu.ops.p3m_forces import _gather_blocks, _pp_unpack, _taper

    sx, sy, sgm = _pack_source_blocks(pos, gm, lo, inv_c, GC, CAP)
    order_t, cid_t, rank_t, counts_t = _cell_pack(pos, lo, inv_c, GC)
    trows = jnp.concatenate([pos, radius[:, None]], axis=-1)[order_t]
    tx, ty, trad = _gather_blocks(
        [(trows[:, 0], 0.0), (trows[:, 1], 0.0), (trows[:, 2], 1.0)],
        counts_t, GC, CAP)

    pad = ((1, 1), (1, 1), (0, 0))

    def neighbors(a):
        ap = jnp.pad(a, pad)
        return jnp.concatenate(
            [ap[oi:oi + GC, oj:oj + GC] for oi in range(3) for oj in range(3)],
            axis=-1)

    nsx, nsy, nsg = neighbors(sx), neighbors(sy), neighbors(sgm)
    ncell = GC * GC
    nbw = nsx.shape[-1]

    # --- compaction: actives first, static a_cap panel
    cnt = jnp.minimum(counts_t, CAP)
    has_src = jnp.any(nsg.reshape(ncell, nbw) != 0.0, axis=-1)
    active = (cnt > 0) & has_src
    order = jnp.argsort(jnp.where(active, 0, 1), stable=True)
    idx = order[:a_cap]
    fl = lambda a, w: a.reshape(ncell, w)[idx]
    txc, tyc, trc = fl(tx, CAP), fl(ty, CAP), fl(trad, CAP)
    nsxc, nsyc, nsgc = fl(nsx, nbw), fl(nsy, nbw), fl(nsg, nbw)

    rc2 = rc * rc
    eps2 = jnp.float32(4.0)

    def row(args):
        tx_r, ty_r, tr_r, sx_r, sy_r, sg_r = args
        dx = sx_r[:, None, :] - tx_r[:, :, None]
        dy = sy_r[:, None, :] - ty_r[:, :, None]
        d2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(d2 + tr_r[:, :, None])
        exact3 = inv * inv * inv
        invq = jax.lax.rsqrt(d2 + eps2)
        smooth3 = invq * invq * invq
        w = sg_r[:, None, :] * (exact3 - _taper(d2, rc) * smooth3)
        w = jnp.where(d2 < rc2, w, 0.0)
        return jnp.stack(
            [jnp.sum(w * dx, axis=-1), jnp.sum(w * dy, axis=-1)], axis=-1)

    shp = lambda a, w: a.reshape(a_cap // CHUNK, CHUNK, w)
    corr_c = jax.lax.map(
        jax.checkpoint(row),
        (shp(txc, CAP), shp(tyc, CAP), shp(trc, CAP),
         shp(nsxc, nbw), shp(nsyc, nbw), shp(nsgc, nbw)),
    ).reshape(a_cap, CAP, 2)

    # --- route back: cell -> compact slot (inactive -> zero sentinel row)
    cellmap = jnp.full((ncell,), a_cap, jnp.int32).at[idx].set(
        jnp.arange(a_cap, dtype=jnp.int32))
    corr_pad = jnp.concatenate(
        [corr_c, jnp.zeros((1, CAP, 2), DTYPE)], axis=0)
    corr_blocks = corr_pad[cellmap]
    return _pp_unpack(corr_blocks, pos.shape[0], order_t, cid_t,
                      rank_t, rank_t, CAP)


def main():
    global A_CAPS
    SCENES = [(1_000_000, 4), (262_144, 3)]
    pick = [int(sys.argv[1])] if len(sys.argv) > 1 else range(len(SCENES))
    A_CAPS = ([int(c) for c in sys.argv[2:]] if len(sys.argv) > 2
              else (GC * GC // 4, GC * GC // 2))

    for n, ngal in (SCENES[i] for i in pick):
        scene = make_galaxies(n, ngal, seed=1)
        pos = jnp.asarray(scene.pos)
        radius = jnp.asarray(scene.radius)
        gm = jnp.asarray(10.0 * scene.mass)
        lo, inv_c, rc = jax.jit(_stage_inputs)(pos, radius, gm)
        lo, inv_c, rc = map(jax.device_get, (lo, inv_c, rc))
        lo, rc = jnp.asarray(lo), float(rc)

        # occupancy + parity (a_cap = smallest tested; must cover all actives)
        ref = np.asarray(jax.jit(
            lambda p: pp_full(p, radius, gm, lo, inv_c, rc))(pos))
        got = np.asarray(jax.jit(
            lambda p: pp_compact(p, radius, gm, lo, inv_c, rc, A_CAPS[0]))(pos))
        scale = np.abs(ref).max() + 1e-30
        err = np.abs(got - ref).max() / scale
        print(f"N={n} ngal={ngal}: compact(a_cap={A_CAPS[0]}) parity rel-err "
              f"{err:.1e}", flush=True)

        base = kloop(lambda p: pp_full(p, radius, gm, lo, inv_c, rc), pos)
        chk = kloop(lambda p: pp_full(p, radius, gm, lo, inv_c, rc, 64), pos)
        print(f"  row-map baseline {base:.1f} ms; chunk=64 {chk:.1f} ms "
              f"({base / chk:.2f}x)", flush=True)
        for a in A_CAPS:
            t = kloop(lambda p: pp_compact(p, radius, gm, lo, inv_c, rc, a), pos)
            print(f"  compact a_cap={a:5d}: {t:.1f} ms  ({base / t:.2f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
