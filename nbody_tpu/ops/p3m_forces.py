"""P³M (particle-particle particle-mesh): accurate O(N) gravity at scale.

Beyond-reference capability, completing the ``pm`` backend (the reference is
direct-sum only, ``particle_cs.glsl:35-49``): the classic force-splitting
scheme that keeps the particle-mesh far field but restores the reference's
EXACT near-field force law — including its per-target ``+ radius`` softening
quirk (``sim_cpu.c:176``) — for every pair closer than a cutoff ``rc``:

  F_total = F_mesh(tapered kernel)  +  F_pp(exact - tapered, pairs d < rc)

* **Mesh stage**: identical to ``pm_forces`` except the real-space kernel is
  multiplied by a smootherstep taper ``g(d/rc)`` (C² at both ends, zero at
  the origin). Beyond ``rc`` the kernel — and therefore the far field — is
  unchanged; inside ``rc`` the grid only carries the band-limited part it
  can represent, which is exactly what the PP stage assumes it did.
* **PP stage, shaped for the TPU**: both targets and sources are packed
  into dense fixed-capacity cell blocks ``(gc, gc, cap)`` on the same
  adaptive box (cell size ≥ rc, so all d < rc pairs live in the 3×3
  neighborhood; ``gc = grid // rc_cells`` is static, the box is traced).
  The 9 neighbor offsets are then *shifted array slices* of the zero-padded
  source blocks — pure VPU broadcast arithmetic over ``(gc, cap_t, cap_s)``
  tiles, NO gathers in the pair loop (a first draft gathered 9·cap
  candidates per target and ran 100× slower than the mesh stage). Each
  particle pays exactly one gather (cell unpack) and one scatter (repack)
  per substep — the same traffic class as the mesh stage's CIC.
  Per close pair the correction is
  ``gm_j · dvec · [(d² + radius_i)^(-3/2) − g(d/rc)·(d² + eps²)^(-3/2)]``:
  the exact reference force minus what the mesh already delivered.
* **Capacity semantics**: cells keep up to ``cell_capacity`` sources,
  **heaviest-first** (galaxy cores are never dropped), and up to
  ``cell_capacity`` targets in stable (massive-first) order; overflow
  degrades the dropped lightest pairs to mesh-only accuracy and is
  reported by ``p3m_cell_overflow``.
* **Exact-target override**: the reference's softening scale is the target's
  radius, and galaxy cores carry radii up to ~600 (``galaxy.h:14``) — far
  beyond any sensible rc, so *their* incoming force would keep a O(radius/d²)
  error past the cutoff. Cores are few: the ``exact_targets`` largest-radius
  targets get a plain direct-sum row (O(k·S), negligible) scattered over the
  P³M result, making the force on cores reference-exact.

Accuracy: pairwise forces are reference-exact for d < rc and for the
``exact_targets`` biggest targets; the residual is the mesh discretization
error of the tapered far field (measured envelopes in tests/test_p3m.py).
TPU shape: scatter-add/gather/FFT/sort primitives only, no data-dependent
shapes; jits and runs unchanged on CPU; reverse-mode differentiable
(integer sort/top_k indices — gradients flow through the gathers they
index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import DTYPE, SOFTENING_FLOOR
from .pm_forces import _bounds, _box, _cic_gather, _cic_scatter, _solve


def _taper(d2, rc):
    """Smootherstep 6u⁵-15u⁴+10u³ of u = d/rc, clamped above at 1 (u >= 0
    holds by construction: sqrt is non-negative). The tiny bias keeps
    reverse-mode AD finite at d2 = 0 (sqrt'(0) = inf would meet the 0-valued
    polynomial derivative as 0·inf = NaN). (An rsqrt+hoisted-reciprocal
    rewrite of sqrt/rc measured EXACTLY neutral at N=1M — the pair map is
    not transcendental-bound — so the literal form stays.)"""
    u = jnp.minimum(jnp.sqrt(d2 + 1e-12) / rc, 1.0)
    return u * u * u * (10.0 + u * (6.0 * u - 15.0))


def _cell_ids(pos, lo, inv_c, gc):
    ij = jnp.clip(jnp.floor((pos - lo) * inv_c).astype(jnp.int32), 0, gc - 1)
    return ij[:, 0] * gc + ij[:, 1]


def _cell_pack(pos, lo, inv_c, gc, priority=None):
    """Sort particles by cell (optionally by descending ``priority`` within
    a cell; stable original order otherwise) and compute each one's slot:
    (order, rank, counts). Slot (cid, rank) is unique per particle."""
    n = pos.shape[0]
    cid_raw = _cell_ids(pos, lo, inv_c, gc)
    if priority is not None:
        order = jnp.lexsort((-priority, cid_raw))
    else:
        order = jnp.argsort(cid_raw, stable=True)
    cid = cid_raw[order]
    # per-cell counts via binary search on the sorted ids (a segment_sum
    # here is a 1M-row scatter-add — ~20x slower on TPU than this gather)
    bounds = jnp.searchsorted(cid, jnp.arange(gc * gc + 1, dtype=jnp.int32))
    counts = jnp.diff(bounds).astype(jnp.int32)
    rank = jnp.arange(n, dtype=jnp.int32) - bounds[cid]
    return order, cid, rank, counts


def _to_blocks(vals, cid, rank, gc, cap, fill=0.0):
    """Scatter sorted per-particle values into (gc, gc, cap) cell blocks;
    ranks >= cap are dropped (overflow -> mesh-only accuracy).

    Kept for unit tests / small inputs; the production path uses
    :func:`_gather_blocks` — 1M-row scatters measured ~20 ms each on TPU
    where the equivalent block gather is ~1 ms."""
    out = jnp.full((gc * gc, cap), jnp.asarray(fill, DTYPE))
    out = out.at[cid, rank].set(vals.astype(DTYPE), mode="drop")
    return out.reshape(gc, gc, cap)


def _gather_blocks(sorted_vals_fills, counts, gc, cap):
    """Build (gc, gc, cap) cell blocks from cell-sorted value arrays by
    GATHER: block[c, k] = vals[starts[c] + k] for k < min(counts[c], cap),
    else fill. The channels are stacked and fetched in ONE gather through a
    shared (gc², cap) index panel — measured on v5e, each 1.57M-element
    gather costs ~15 ms, so one stacked gather instead of three is the
    difference between a ~30 ms and a ~90 ms pack at N=1M."""
    counts = counts.astype(jnp.int32)
    stacked = jnp.stack([v.astype(DTYPE) for v, _ in sorted_vals_fills],
                        axis=-1)                       # (N, C)
    c_dim = stacked.shape[-1]
    fills = jnp.array([f for _, f in sorted_vals_fills], DTYPE)
    starts = jnp.cumsum(counts) - counts
    slot = jnp.arange(cap, dtype=jnp.int32)
    ok = slot[None, :] < jnp.minimum(counts, cap)[:, None]
    idx = jnp.where(ok, starts[:, None] + slot[None, :], 0)
    got = stacked[idx]                                 # (gc², cap, C)
    out3 = jnp.where(ok[..., None], got, fills)
    # (an N-row scatter form was measured as well: 2.2x slower at N=1M and
    # 1.3x slower at 262k — TPU scatters lose to monotonic gathers even
    # when they move fewer elements)
    return [out3[..., c].reshape(gc, gc, cap) for c in range(c_dim)]


def _composite_pack(rows, oidx, okc, fills):
    """Cell blocks in ONE gather: ``rows`` are the ORIGINAL (unpermuted)
    (N, C) per-particle values, ``oidx[c, k] = order[starts[c] + k]`` is the
    precomputed composite slot->original-row index (position-independent,
    so frozen-bins-cacheable), ``okc`` masks slots beyond each cell's count.
    Measured v5e, N=1M, gc=128, cap=96 (scripts/ablations/tune_r3e_block_pack.py):
    10.3 ms vs 16.0 ms for the production permute+per-slot-pack chain —
    the 1M-row permutation gather disappears. The oidx build costs ~10 ms
    itself, so this form only wins when oidx is reused across substeps
    (``p3m_rebin_interval`` > 1)."""
    got = rows[oidx]                                   # (gc², cap, C)
    return jnp.where(okc[..., None], got, fills)


def _pack_source_blocks(src_pos, src_gm, lo, inv_c, gc, cap):
    """Pack sources into (gc, gc, cap) cell blocks, heaviest-first within a
    cell. Empty slots / dropped overflow keep gm = 0 => contribute exactly
    zero (the reference's own zero-pad trick, sim_cpu.c:133-142)."""
    order_s, _, _, counts = _cell_pack(src_pos, lo, inv_c, gc,
                                       priority=src_gm)
    # one stacked row gather (x, y, gm) instead of two
    row = jnp.concatenate([src_pos, src_gm[:, None]], axis=-1)[order_s]
    sx, sy, sgm = _gather_blocks(
        [(row[:, 0], 0.0), (row[:, 1], 0.0), (row[:, 2], 0.0)],
        counts, gc, cap)
    return sx, sy, sgm


def _pp_correction(tgt_pos, tgt_radius, src_pos, src_gm, lo, inv_c, gc,
                   cap, rc, eps2, precise):
    """Short-range correction (exact minus tapered-smooth, pairs d < rc)
    via dense cell blocks and shifted-slice neighbor access. Returns (T, 2).
    """
    blocks = _pack_source_blocks(src_pos, src_gm, lo, inv_c, gc, cap)
    return _pp_from_blocks(tgt_pos, tgt_radius, blocks, lo, inv_c, gc,
                           cap, rc, eps2, precise)


def _pp_from_blocks(tgt_pos, tgt_radius, src_blocks, lo, inv_c, gc,
                    cap_t, rc, eps2, precise):
    """PP correction of ``tgt_pos`` against pre-packed (gc, gc, cap_s)
    source cell blocks, packing the targets itself (single-device path;
    the collective path computes the target assignment — including the
    cross-device global-rank offsets — in ``p3m_bins_collective`` and
    calls :func:`_pp_apply` directly)."""
    order_t, cid_t, rank_t, counts_t = _cell_pack(tgt_pos, lo, inv_c, gc)
    return _pp_apply(tgt_pos, tgt_radius, src_blocks,
                     order_t, cid_t, rank_t, counts_t, rank_t,
                     gc, cap_t, rc, eps2, precise)


def _pp_apply(tgt_pos, tgt_radius, src_blocks, order_t, cid_t, rank_t,
              counts_t, grank_t, gc, cap_t, rc, eps2, precise,
              pack_t=None, unpack=None, chunk=None, compact=None):
    """PP correction given pre-packed source blocks AND a pre-computed
    target cell assignment (order/cid/rank/counts). Positions are always
    read fresh through the (possibly frozen — see ``p3m_bins``) orders.

    ``pack_t`` / ``unpack`` optionally carry the composite-index forms from
    ``p3m_bins(composite=True)``: ``pack_t = (oidx_t, ok_t)`` packs target
    blocks in one gather of the ORIGINAL rows, and ``unpack = (flat, okm)``
    restores original order with one flat-index gather instead of the
    slot-gather + lax.sort chain (measured deltas in _composite_pack and
    scripts/ablations/tune_r3e_block_pack.py).

    ``compact``: opt-in active-cell compaction (requires ``chunk``; see
    :func:`p3m_acc` for semantics and the measured win).

    The pair blocks run through XLA's fused map — a hand-written Pallas
    alternative exists (ops/p3m_pallas.py) but measured 30 ms vs 17 ms at
    N=1M (the §3 broadcast-materialization tax plus per-cell dynamic-slice
    overhead) and ships as a tested ablation only."""
    sx, sy, sgm = src_blocks
    # + SOFTENING_FLOOR: keeps a zero-gm candidate coincident with a radius-0
    # target at 0 instead of 0*inf -> NaN; absorbed for real radii (types.py).
    trows = jnp.concatenate(
        [tgt_pos, tgt_radius[:, None] + SOFTENING_FLOOR], axis=-1)
    if pack_t is not None:
        oidx_t, ok_t = pack_t
        t3 = _composite_pack(trows, oidx_t, ok_t,
                             jnp.array([0.0, 0.0, 1.0], DTYPE))
        tx, ty, trad = (t3[..., c].reshape(gc, gc, cap_t) for c in range(3))
    else:
        trow = trows[order_t]
        tx, ty, trad = _gather_blocks(
            [(trow[:, 0], 0.0), (trow[:, 1], 0.0), (trow[:, 2], 1.0)],
            counts_t, gc, cap_t)

    # -- zero-pad a one-cell ring (out-of-range neighbors read gm = 0 rows)
    #    and concatenate the 9 shifted neighbor views along the capacity
    #    axis: cell (i, j)'s candidate sources become ONE (9·cap) row. A
    #    static relayout — no gathers, and the pair loop below is a single
    #    broadcast chain (an early 9-offset unrolled form compiled 10x
    #    slower and made reverse-mode AD intractable).
    pad = ((1, 1), (1, 1), (0, 0))

    def neighbors(a):
        ap = jnp.pad(a, pad)
        return jnp.concatenate(
            [ap[oi:oi + gc, oj:oj + gc] for oi in range(3) for oj in range(3)],
            axis=-1)

    nsx, nsy, nsg = neighbors(sx), neighbors(sy), neighbors(sgm)
    rc2 = rc * rc

    def row(args):
        # one target cell row vs its (gc, 9·cap) candidate sources
        tx_r, ty_r, tr_r, sx_r, sy_r, sg_r = args
        dx = sx_r[:, None, :] - tx_r[:, :, None]   # (gc, cap_t, 9·cap_s)
        dy = sy_r[:, None, :] - ty_r[:, :, None]
        d2 = dx * dx + dy * dy
        if precise:
            r2 = d2 + tr_r[:, :, None]
            exact3 = 1.0 / (jnp.sqrt(r2) * r2)
            q2 = d2 + eps2
            smooth3 = 1.0 / (jnp.sqrt(q2) * q2)
        else:
            inv = jax.lax.rsqrt(d2 + tr_r[:, :, None])
            exact3 = inv * inv * inv
            invq = jax.lax.rsqrt(d2 + eps2)
            smooth3 = invq * invq * invq
        w = sg_r[:, None, :] * (exact3 - _taper(d2, rc) * smooth3)
        w = jnp.where(d2 < rc2, w, 0.0)
        return jnp.stack(
            [jnp.sum(w * dx, axis=-1), jnp.sum(w * dy, axis=-1)], axis=-1)

    # checkpoint: under reverse-mode AD, grad-of-map would otherwise store
    # every row's (cap_t, 9·cap_s) pairwise intermediates as scan residuals
    # — O(gc²·cap²) memory, gigabytes at production sizes. Rematerializing
    # the row in the backward pass keeps residuals at O(row inputs); the
    # primal-only path is unaffected.
    ncell = gc * gc
    nbw = nsx.shape[-1]
    cnt_flat = jnp.minimum(counts_t, cap_t).reshape(ncell)

    def chunk_body(args):
        blk, c = args[:-1], args[-1]
        active = jnp.any(c > 0) & jnp.any(blk[5] != 0.0)
        return jax.lax.cond(
            active, row,
            lambda _: jnp.zeros((chunk, cap_t, 2), DTYPE), blk)

    def chunked_map(txf, tyf, trf, nsxf, nsyf, nsgf, cnt, m):
        # Occupancy-aware form: lax.map lowers to a SEQUENTIAL scan, so a
        # per-chunk lax.cond genuinely skips the pair math for chunks of
        # ``chunk`` cells with no targets or no candidate sources. Galaxy
        # scenes are clusters — at N=1M/4 galaxies only ~23% of 16-cell
        # chunks are active (vs ~72% of full gc-rows), so chunking the map
        # at sub-row granularity is what unlocks the skip.
        ops = (txf.reshape(-1, chunk, cap_t), tyf.reshape(-1, chunk, cap_t),
               trf.reshape(-1, chunk, cap_t), nsxf.reshape(-1, chunk, nbw),
               nsyf.reshape(-1, chunk, nbw), nsgf.reshape(-1, chunk, nbw),
               cnt.reshape(-1, chunk))
        return jax.lax.map(
            jax.checkpoint(chunk_body), ops).reshape(m, cap_t, 2)

    def full_map(_):
        if chunk and ncell % chunk == 0:
            return chunked_map(tx, ty, trad, nsx, nsy, nsg, cnt_flat, ncell)
        return jax.lax.map(
            jax.checkpoint(row), (tx, ty, trad, nsx, nsy, nsg)
        ).reshape(ncell, cap_t, 2)

    use_compact = (compact and chunk and compact % chunk == 0
                   and compact < ncell and ncell % chunk == 0)
    if use_compact:
        # Active-cell compaction (scripts/ablations/tune_r3i_pp_compact.py): the
        # chunk-skip pays for a whole chunk when one cell in it is active;
        # compacting the active cells into a static ``compact``-row panel
        # (stable argsort actives-first) runs the pair map over actives
        # only, then one remapped gather routes rows back (inactive cells
        # read a zero sentinel — their correction is exactly zero by the
        # same argument as the chunk skip). Exact only while
        # n_active <= compact, so a lax.cond falls back to the full map —
        # results are exact either way; only speed depends on occupancy.
        txf, tyf, trf = (a.reshape(ncell, cap_t) for a in (tx, ty, trad))
        nsxf, nsyf, nsgf = (a.reshape(ncell, nbw) for a in (nsx, nsy, nsg))
        active = (cnt_flat > 0) & jnp.any(nsgf != 0.0, axis=-1)
        n_active = jnp.sum(active.astype(jnp.int32))

        def compact_map(_):
            order = jnp.argsort(jnp.where(active, 0, 1), stable=True)
            idx = order[:compact]
            corr_c = chunked_map(txf[idx], tyf[idx], trf[idx], nsxf[idx],
                                 nsyf[idx], nsgf[idx], cnt_flat[idx],
                                 compact)
            cellmap = jnp.full((ncell,), compact, jnp.int32).at[idx].set(
                jnp.arange(compact, dtype=jnp.int32))
            corr_pad = jnp.concatenate(
                [corr_c, jnp.zeros((1, cap_t, 2), DTYPE)], axis=0)
            return corr_pad[cellmap]

        corr_blocks = jax.lax.cond(
            n_active <= compact, compact_map, full_map, 0)
    else:
        corr_blocks = full_map(0)
    if unpack is not None:
        flat, okm = unpack
        got = corr_blocks.reshape(gc * gc * cap_t, 2)[flat]
        return jnp.where(okm[:, None], got, 0.0).astype(DTYPE)
    return _pp_unpack(corr_blocks, tgt_pos.shape[0], order_t, cid_t,
                      rank_t, grank_t, cap_t)


def _masked_radius(tgt_radius, tgt_mask):
    """Exact-core selection key: padding rows (mask 0) rank -inf so they
    never occupy exact-target slots that real particles could use."""
    if tgt_mask is None:
        return tgt_radius
    real = jnp.reshape(tgt_mask, (-1,)) != 0.0
    return jnp.where(real, tgt_radius, -jnp.inf)


def _pp_unpack(corr_blocks, n, order_t, cid_t, rank_t, grank_t, cap_t):
    """Route per-slot corrections back to original target order: one gather
    per target; overflowed targets (global rank >= cap) received no slot ->
    zero correction (mesh-only accuracy).

    The restore is a SORT by the (unique) original indices carrying the two
    correction channels as payloads, not a scatter: measured 12 ms vs 50 ms
    for the 1M-row permutation scatter on v5e — the same scatters-lose
    finding as `_gather_blocks`."""
    safe = jnp.minimum(rank_t, cap_t - 1)
    got = corr_blocks[cid_t, safe]
    got = jnp.where(((rank_t < cap_t) & (grank_t < cap_t))[:, None],
                    got, 0.0)
    _, ox, oy = jax.lax.sort((order_t, got[:, 0], got[:, 1]), num_keys=1)
    return jnp.stack([ox, oy], axis=-1).astype(DTYPE)


def p3m_acc_collective(
    tgt_pos,        # (n_loc, 2) this device's resident rows
    tgt_radius,     # (n_loc,)
    src_gm_row,     # (n_loc,)  G*mass of the SAME resident rows (0 = inert)
    softening=2.0,
    *,
    grid: int = 512,
    rc_cells: int = 4,
    cell_capacity: int = 96,
    exact_targets: int = 64,
    precise: bool = False,
    tgt_mask=None,
    pp_chunk: int | None = None,
    pp_compact: int | None = None,
    axis_name: str,
    n_devices: int,
):
    """Sharded P³M (call inside ``shard_map``): every device is both a
    target shard and a source shard (its resident rows weighted by
    ``src_gm_row``, like the collective PM). All communication is fixed-size
    and independent of N:

    * **mesh stage** — one psum of the (G, G) tapered mass grid
      (``pm_acc_collective`` pattern); box agreed via pmin/pmax;
    * **PP stage** — each device packs its local sources into full-capacity
      ``(gc, gc, cap)`` cell blocks, one all-gather merges them along the
      capacity axis (O(gc²·cap) over ICI), and a per-cell ``top_k`` by gm
      reduces the merged panel back to the *global* heaviest-``cap`` slots —
      every global top-``cap`` source is inside its owner's local top-``cap``,
      so the reduced panel (and therefore the capacity semantics) matches the
      single-device :func:`p3m_acc` exactly; the PP compute shape is then
      identical to single-device regardless of D;
    * **exact-core override** — per-device ``top_k`` radius candidates are
      all-gathered (D·k rows), the global top-``exact_targets`` rows get a
      direct sum accumulated by one psum of per-device partial rows, and each
      device overwrites the rows it owns.

    Returns masked-garbage rows for padding targets exactly like the
    single-device path — the caller multiplies by ``valid``.
    """
    bins = p3m_bins_collective(
        tgt_pos, tgt_radius, src_gm_row, grid=grid, rc_cells=rc_cells,
        cell_capacity=cell_capacity, exact_targets=exact_targets,
        tgt_mask=tgt_mask, axis_name=axis_name, n_devices=n_devices)
    return p3m_acc_collective_from_bins(
        bins, tgt_pos, tgt_radius, src_gm_row, softening,
        grid=grid, rc_cells=rc_cells, cell_capacity=cell_capacity,
        exact_targets=exact_targets, precise=precise, pp_chunk=pp_chunk,
        pp_compact=pp_compact, axis_name=axis_name, n_devices=n_devices)


def _composite_index_maps(order_s, counts_s, order_t, cid_t, rank_t,
                          counts_t, cap, grank_t=None):
    """Composite pack/unpack index tables (scripts/ablations/tune_r3e_block_pack.py):
    slot -> original-row maps for sources and targets plus the
    original-order unpack (flat index + validity). All position-independent
    given the cell orders, so ``p3m_bins``/``p3m_bins_collective`` build
    them once per rebin. ``grank_t`` (rank including the cross-device cell
    offset) folds the collective global-rank drop rule into the unpack
    mask; single-device callers omit it (grank == rank)."""
    slot = jnp.arange(cap, dtype=jnp.int32)

    def oidx_of(order, counts):
        starts = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        n = order.shape[0]
        oidx = order[jnp.minimum(starts[:, None] + slot[None, :], n - 1)]
        okc = slot[None, :] < jnp.minimum(counts, cap)[:, None]
        return oidx, okc

    out = {}
    out["oidx_s"], out["ok_s"] = oidx_of(order_s, counts_s)
    out["oidx_t"], out["ok_t"] = oidx_of(order_t, counts_t)
    # unpack: original-order flat index + validity via one payload sort
    # (the inverse permutation _pp_unpack would otherwise pay every substep)
    _, inv = jax.lax.sort(
        (order_t, jnp.arange(order_t.shape[0], dtype=jnp.int32)),
        num_keys=1)
    out["unpack_flat"] = (cid_t * cap + jnp.minimum(rank_t, cap - 1))[inv]
    ok_t = rank_t < cap
    if grank_t is not None:
        ok_t = ok_t & (grank_t < cap)
    out["unpack_ok"] = ok_t[inv]
    return out


def p3m_bins_collective(
    tgt_pos, tgt_radius, src_gm_row, *,
    grid: int, rc_cells: int, cell_capacity: int, exact_targets: int,
    tgt_mask=None, axis_name: str, n_devices: int,
    big_bins=None, composite: bool = False,
):
    """Collective counterpart of :func:`p3m_bins`: freeze everything about
    the P³M spatial structure that is position-stale-tolerant or
    position-independent, per shard:

    * the globally agreed box (pmin/pmax) and both local cell sort orders;
    * the target count offsets of preceding devices (the global-rank drop
      rule);
    * the merged-panel selection: since gm never changes, the per-cell
      ``top_k`` choosing the global heaviest-``cap`` sources — and the
      merged gm panel itself — are frozen; only the (x, y) panels need
      re-gathering and re-all-gathering each substep;
    * the exact-core candidate rows (radius is constant): per-device
      ``top_k`` indices, the global selection, radii, and each device's
      owned output rows (pass ``big_bins`` to reuse them across rebins —
      the sharded analogue of :func:`p3m_bins`'s ``big=``).
    """
    cap = cell_capacity
    gc = max(grid // rc_cells, 1)
    sg_pos = jax.lax.stop_gradient(tgt_pos)
    all_min, all_max = _bounds(
        sg_pos, sg_pos, jax.lax.stop_gradient(src_gm_row), tgt_mask)
    all_min = jax.lax.pmin(all_min, axis_name)
    all_max = jax.lax.pmax(all_max, axis_name)
    lo, h = _box(all_min, all_max, grid)
    cell = (grid * h) / gc
    inv_c = 1.0 / cell

    order_s, _, _, counts_s = _cell_pack(sg_pos, lo, inv_c, gc,
                                         priority=src_gm_row)
    order_t, cid_t, rank_t, counts_t = _cell_pack(sg_pos, lo, inv_c, gc)
    bins = {
        "lo": lo, "h": h,
        "order_s": order_s, "counts_s": counts_s,
        "order_t": order_t, "cid_t": cid_t, "rank_t": rank_t,
        "counts_t": counts_t,
    }

    (sgm_local,) = _gather_blocks([(src_gm_row[order_s], 0.0)],
                                  counts_s, gc, cap)
    if n_devices > 1:
        all_counts = jax.lax.all_gather(counts_t, axis_name)  # (D, gc²)
        me = jax.lax.axis_index(axis_name)
        before = jnp.arange(n_devices)[:, None] < me
        bins["goff"] = jnp.where(before, all_counts, 0).sum(0)
        sgm_all = jax.lax.all_gather(sgm_local, axis_name, axis=2,
                                     tiled=True)
        bins["sgm"], bins["sel"] = jax.lax.top_k(sgm_all, cap)
    else:
        bins["goff"] = jnp.zeros((gc * gc,), jnp.int32)
        bins["sgm"] = sgm_local

    if composite:
        # composite pack/unpack indices — per shard, with the cross-device
        # global-rank drop rule folded into the unpack mask
        bins.update(_composite_index_maps(
            order_s, counts_s, order_t, cid_t, rank_t, counts_t, cap,
            grank_t=rank_t + bins["goff"][cid_t]))

    if exact_targets:
        if big_bins is not None:
            bins.update(big_bins)
        else:
            bins.update(p3m_exact_core_bins_collective(
                tgt_radius, exact_targets=exact_targets,
                axis_name=axis_name, n_devices=n_devices,
                tgt_mask=tgt_mask))
    return bins


def p3m_exact_core_bins_collective(tgt_radius, *, exact_targets: int,
                                   axis_name: str, n_devices: int,
                                   tgt_mask=None):
    """The position-independent exact-core selection (radius never changes
    during a run): per-device candidate rows, the global top-k choice, its
    radii, and the owned output rows. Compute once per update call and
    thread into :func:`p3m_bins_collective` via ``big_bins``. ``tgt_mask``
    keeps padding rows out of the selection (they rank -inf)."""
    n_loc = tgt_radius.shape[0]
    k_loc = min(exact_targets, n_loc)
    key_loc, i_loc = jax.lax.top_k(_masked_radius(tgt_radius, tgt_mask),
                                   k_loc)
    cand_key = jax.lax.all_gather(key_loc, axis_name).reshape(-1)
    # true radii for the force softening (the -inf key is selection-only)
    cand_r = jax.lax.all_gather(tgt_radius[i_loc], axis_name).reshape(-1)
    cand_i = jax.lax.all_gather(i_loc, axis_name).reshape(-1)
    k = min(exact_targets, n_devices * k_loc)
    _, sel = jax.lax.top_k(cand_key, k)
    me = jax.lax.axis_index(axis_name)
    owner = sel // k_loc
    return {
        "big_i_loc": i_loc,
        "big_sel": sel,
        "big_radius": cand_r[sel],
        "big_row": jnp.where(owner == me, cand_i[sel], n_loc),  # -> dropped
    }


def p3m_acc_collective_from_bins(
    bins, tgt_pos, tgt_radius, src_gm_row, softening=2.0, *,
    grid: int, rc_cells: int, cell_capacity: int, exact_targets: int,
    precise: bool = False, pp_chunk: int | None = None,
    pp_compact: int | None = None,
    axis_name: str, n_devices: int,
):
    """Sharded P³M with a frozen collective structure (see
    :func:`p3m_bins_collective`). With fresh bins this equals
    :func:`p3m_acc_collective`; with stale bins, positions are still read
    fresh everywhere (mesh scatter, pair distances, exact-core rows) and
    only the candidate windows / box lag — the sharded rebin path."""
    eps2 = jnp.asarray(softening, DTYPE) ** 2
    lo, h = bins["lo"], bins["h"]
    rc = rc_cells * h
    gc = max(grid // rc_cells, 1)
    cell = (grid * h) / gc
    cap = cell_capacity

    rho = _cic_scatter(tgt_pos, src_gm_row, lo, 1.0 / h, grid)
    rho = jax.lax.psum(rho, axis_name)
    a_grid = _solve(rho, h, eps2, grid, rc=rc)
    acc = _cic_gather(a_grid, tgt_pos, lo, 1.0 / h, grid)

    # source (x, y) panels: fresh positions through the frozen order; the
    # gm panel and the merge selection come frozen from the bins
    if "oidx_s" in bins:
        s2 = _composite_pack(tgt_pos, bins["oidx_s"], bins["ok_s"],
                             jnp.zeros((2,), DTYPE))
        sx = s2[..., 0].reshape(gc, gc, cap)
        sy = s2[..., 1].reshape(gc, gc, cap)
        pack_t = (bins["oidx_t"], bins["ok_t"])
        unpack = (bins["unpack_flat"], bins["unpack_ok"])
    else:
        ps = tgt_pos[bins["order_s"]]
        sx, sy = _gather_blocks([(ps[:, 0], 0.0), (ps[:, 1], 0.0)],
                                bins["counts_s"], gc, cap)
        pack_t = unpack = None
    if n_devices > 1:
        sx = jax.lax.all_gather(sx, axis_name, axis=2, tiled=True)
        sy = jax.lax.all_gather(sy, axis_name, axis=2, tiled=True)
        sx = jnp.take_along_axis(sx, bins["sel"], axis=-1)
        sy = jnp.take_along_axis(sy, bins["sel"], axis=-1)
    grank_t = bins["rank_t"] + bins["goff"][bins["cid_t"]]
    acc = acc + _pp_apply(
        tgt_pos, tgt_radius, (sx, sy, bins["sgm"]),
        bins["order_t"], bins["cid_t"], bins["rank_t"], bins["counts_t"],
        grank_t, gc, cap, rc, eps2, precise,
        pack_t=pack_t, unpack=unpack, chunk=pp_chunk, compact=pp_compact)

    if exact_targets:
        from .. import forces

        cand_pos = jax.lax.all_gather(tgt_pos[bins["big_i_loc"]], axis_name)
        big_pos = cand_pos.reshape(-1, 2)[bins["big_sel"]]
        partial = forces.pair_acc(big_pos, bins["big_radius"],
                                  tgt_pos, src_gm_row, precise=precise)
        exact = jax.lax.psum(partial, axis_name)
        acc = acc.at[bins["big_row"]].set(exact, mode="drop")
    return acc.astype(DTYPE)


@functools.partial(jax.jit, static_argnames=(
    "grid", "rc_cells", "cell_capacity", "exact_targets", "precise",
    "pp_chunk", "pp_compact"))
def p3m_acc(
    tgt_pos: jax.Array,     # (T, 2)
    tgt_radius: jax.Array,  # (T,)  per-target softening (reference semantics)
    src_pos: jax.Array,     # (S, 2)
    src_gm: jax.Array,      # (S,)  G*mass (zero rows inert)
    softening: jax.Array | float = 2.0,
    *,
    grid: int = 512,
    rc_cells: int = 4,
    cell_capacity: int = 96,
    exact_targets: int = 64,
    precise: bool = False,
    tgt_mask: jax.Array | None = None,
    pp_chunk: int | None = None,
    pp_compact: int | None = None,
) -> jax.Array:
    """Accelerations on targets: tapered particle-mesh far field + exact
    short-range pair correction + direct-sum override for the
    ``exact_targets`` largest-radius targets. See module docstring.

    ``pp_chunk``: iterate the PP pair map ``pp_chunk`` cells at a time and
    skip chunks with no targets or no candidate sources — skipped cells
    contribute exactly zero, so the chunked map is bit-identical to the
    row map (the surrounding program may still fuse ~1 ulp differently
    across recompiles). Galaxy scenes are clusters, so most chunks are
    empty: measured 1.09x on the full PP stage at N=1M
    (scripts/ablations/tune_r3g_pp_skip.py). Ignored unless it divides gc².

    ``pp_compact``: additionally compact the active cells into a static
    ``pp_compact``-row panel and run the (chunked) pair map over that panel
    only — the chunk skip's win is bounded by chunk granularity, the
    compaction's isn't. A ``lax.cond`` falls back to the full chunked map
    whenever the active-cell count exceeds ``pp_compact``, so results are
    exact at any setting; only speed depends on occupancy. Measured
    (scripts/ablations/tune_r3i_pp_compact.py, N=1M/4gal, pp_compact=gc²/4): isolated
    PP stage 80.5 → 70.4 ms vs the chunk skip. Requires ``pp_chunk`` and
    must be a multiple of it; ignored otherwise (or when >= gc²). Grad
    caveat matches ``pp_chunk``: sources with exactly zero gm in a dropped
    cell get zero mass-gradient, so the autodiff rollouts leave both off by
    default.

    Padded target rows (``tgt_mask`` = 0, origin-pinned) are excluded from
    the adaptive box; they may consume target-cell slots near the origin but
    sort after real rows (stable order), so they overflow first. Their
    output rows are garbage-but-finite — callers mask them, as with ``pm``.
    """
    bins = p3m_bins(
        tgt_pos, tgt_radius, src_pos, src_gm, grid=grid, rc_cells=rc_cells,
        exact_targets=exact_targets, tgt_mask=tgt_mask)
    return p3m_acc_from_bins(
        bins, tgt_pos, tgt_radius, src_pos, src_gm, softening,
        grid=grid, rc_cells=rc_cells, cell_capacity=cell_capacity,
        precise=precise, pp_chunk=pp_chunk, pp_compact=pp_compact)


def p3m_bins(
    tgt_pos, tgt_radius, src_pos, src_gm, *,
    grid: int, rc_cells: int, exact_targets: int,
    tgt_mask=None, big=None,
    composite_capacity: int | None = None,
):
    """Freeze the P³M spatial structure for reuse across substeps: the
    adaptive box, both cell sort orders (sources heaviest-first, targets
    stable), the per-cell counts, and the exact-core row indices — a dict
    pytree with static shapes, carried through ``lax.fori_loop`` by the
    ``p3m_rebin_interval`` path of ``world.update_state``.

    This is the Verlet-neighbor-list amortization from molecular dynamics:
    positions are always read FRESH through these orders (the pair math
    stays exact); only the neighbor *candidate* set goes stale. A pair
    missed because it entered the cutoff after binning sat at distance
    >= rc - drift, where the smootherstep-tapered correction is already
    near zero — the error is bounded by the drift since the last rebin
    (measured envelopes in tests/test_p3m.py)."""
    all_min, all_max = _bounds(
        jax.lax.stop_gradient(tgt_pos), jax.lax.stop_gradient(src_pos),
        jax.lax.stop_gradient(src_gm), tgt_mask)
    lo, h = _box(all_min, all_max, grid)
    gc = max(grid // rc_cells, 1)
    cell = (grid * h) / gc  # >= rc, so d < rc pairs live in 3x3 neighbors
    inv_c = 1.0 / cell
    order_s, _, _, counts_s = _cell_pack(src_pos, lo, inv_c, gc,
                                         priority=src_gm)
    order_t, cid_t, rank_t, counts_t = _cell_pack(tgt_pos, lo, inv_c, gc)
    extra = {}
    if composite_capacity is not None:
        # Composite-index forms (scripts/ablations/tune_r3e_block_pack.py): cost ~30 ms
        # to build at N=1M but save ~15 ms per substep — net win exactly when
        # reused across substeps, so callers request them iff
        # p3m_rebin_interval > 1. All position-independent given the orders.
        extra = _composite_index_maps(order_s, counts_s, order_t, cid_t,
                                      rank_t, counts_t, composite_capacity)
    if big is None:
        # radius is constant in a run; loop callers precompute this once.
        # The selection KEY masks padding rows to -inf so they never
        # displace real low-radius targets from exact treatment; the
        # forces themselves always use the true radii.
        k = min(exact_targets, tgt_pos.shape[0])
        _, big = jax.lax.top_k(_masked_radius(tgt_radius, tgt_mask), k)
    return {
        "lo": lo, "h": h,
        "order_s": order_s, "counts_s": counts_s,
        "order_t": order_t, "cid_t": cid_t, "rank_t": rank_t,
        "counts_t": counts_t, "big": big, **extra,
    }


def p3m_acc_from_bins(
    bins, tgt_pos, tgt_radius, src_pos, src_gm,
    softening=2.0, *,
    grid: int, rc_cells: int, cell_capacity: int,
    precise: bool = False,
    pp_chunk: int | None = None,
    pp_compact: int | None = None,
):
    """P³M accelerations with a frozen spatial structure (see
    :func:`p3m_bins`). With bins built from the same positions this is
    bit-identical to :func:`p3m_acc`; with stale bins the mesh stage and
    all pair distances still use current positions — only the PP candidate
    windows and the box lag."""
    eps2 = jnp.asarray(softening, DTYPE) ** 2
    lo, h = bins["lo"], bins["h"]
    rc = rc_cells * h

    rho = _cic_scatter(src_pos, src_gm, lo, 1.0 / h, grid)
    a_grid = _solve(rho, h, eps2, grid, rc=rc)
    acc = _cic_gather(a_grid, tgt_pos, lo, 1.0 / h, grid)

    gc = max(grid // rc_cells, 1)
    cap = cell_capacity
    if "oidx_s" in bins:
        s3 = _composite_pack(
            jnp.concatenate([src_pos, src_gm[:, None]], axis=-1),
            bins["oidx_s"], bins["ok_s"], jnp.zeros((3,), DTYPE))
        src_blocks = [s3[..., c].reshape(gc, gc, cap) for c in range(3)]
        pack_t = (bins["oidx_t"], bins["ok_t"])
        unpack = (bins["unpack_flat"], bins["unpack_ok"])
    else:
        ps = src_pos[bins["order_s"]]
        src_blocks = _gather_blocks(
            [(ps[:, 0], 0.0), (ps[:, 1], 0.0),
             (src_gm[bins["order_s"]], 0.0)],
            bins["counts_s"], gc, cap)
        pack_t = unpack = None
    acc = acc + _pp_apply(
        tgt_pos, tgt_radius, src_blocks,
        bins["order_t"], bins["cid_t"], bins["rank_t"], bins["counts_t"],
        bins["rank_t"], gc, cap, rc, eps2, precise,
        pack_t=pack_t, unpack=unpack, chunk=pp_chunk, compact=pp_compact)

    big = bins["big"]
    if big.shape[0]:
        from .. import forces

        exact = forces.pair_acc(tgt_pos[big], tgt_radius[big],
                                src_pos, src_gm, precise=precise)
        acc = acc.at[big].set(exact)
    return acc.astype(DTYPE)


@functools.partial(jax.jit, static_argnames=("grid", "rc_cells",
                                             "cell_capacity"))
def p3m_cell_overflow(
    src_pos: jax.Array,
    src_gm: jax.Array,
    *,
    grid: int = 512,
    rc_cells: int = 4,
    cell_capacity: int = 96,
) -> jax.Array:
    """Number of sources dropped from over-full cells (their close pairs
    degrade to mesh-only accuracy; the dropped ones are the lightest). A
    diagnostic: raise ``cell_capacity`` (or the grid) if this is a
    meaningful fraction of N."""
    all_min, all_max = _bounds(src_pos, src_pos, src_gm, None)
    lo, h = _box(all_min, all_max, grid)
    gc = max(grid // rc_cells, 1)
    cell = (grid * h) / gc
    _, _, _, counts = _cell_pack(src_pos, lo, 1.0 / cell, gc,
                                 priority=src_gm)
    return jnp.sum(jnp.maximum(counts - cell_capacity, 0))
