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

from ..types import DTYPE
from .pm_forces import _bounds, _box, _cic_gather, _cic_scatter, _solve


def _taper(d2, rc):
    """Smootherstep 6u⁵-15u⁴+10u³ of u = d/rc, clipped to [0, 1]. The tiny
    bias keeps reverse-mode AD finite at d2 = 0 (sqrt'(0) = inf would meet
    the 0-valued polynomial derivative as 0·inf = NaN)."""
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
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cid,
                                 num_segments=gc * gc)
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(n, dtype=jnp.int32) - starts[cid]
    return order, cid, rank, counts


def _to_blocks(vals, cid, rank, gc, cap, fill=0.0):
    """Scatter sorted per-particle values into (gc, gc, cap) cell blocks;
    ranks >= cap are dropped (overflow -> mesh-only accuracy)."""
    out = jnp.full((gc * gc, cap), jnp.asarray(fill, DTYPE))
    out = out.at[cid, rank].set(vals.astype(DTYPE), mode="drop")
    return out.reshape(gc, gc, cap)


def _pp_correction(tgt_pos, tgt_radius, src_pos, src_gm, lo, inv_c, gc,
                   cap, rc, eps2, precise):
    """Short-range correction (exact minus tapered-smooth, pairs d < rc)
    via dense cell blocks and shifted-slice neighbor access. Returns (T, 2).
    """
    # -- pack sources (heaviest-first within a cell) and targets (stable,
    #    massive-first-world order) into cell blocks
    order_s, cid_s, rank_s, _ = _cell_pack(src_pos, lo, inv_c, gc,
                                           priority=src_gm)
    sx = _to_blocks(src_pos[order_s, 0], cid_s, rank_s, gc, cap)
    sy = _to_blocks(src_pos[order_s, 1], cid_s, rank_s, gc, cap)
    # empty slots / dropped overflow keep gm = 0 => contribute exactly zero
    # (the reference's own zero-pad trick, sim_cpu.c:133-142)
    sgm = _to_blocks(src_gm[order_s], cid_s, rank_s, gc, cap)

    order_t, cid_t, rank_t, _ = _cell_pack(tgt_pos, lo, inv_c, gc)
    tx = _to_blocks(tgt_pos[order_t, 0], cid_t, rank_t, gc, cap)
    ty = _to_blocks(tgt_pos[order_t, 1], cid_t, rank_t, gc, cap)
    trad = _to_blocks(tgt_radius[order_t], cid_t, rank_t, gc, cap, fill=1.0)

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
    corr_blocks = jax.lax.map(
        jax.checkpoint(row), (tx, ty, trad, nsx, nsy, nsg)
    ).reshape(gc * gc, cap, 2)

    # -- unpack: one gather per target; overflowed targets (rank >= cap)
    #    received no slot -> zero correction (mesh-only accuracy)
    safe = jnp.minimum(rank_t, cap - 1)
    got = corr_blocks[cid_t, safe]
    got = jnp.where((rank_t < cap)[:, None], got, 0.0)
    return jnp.zeros((tgt_pos.shape[0], 2), DTYPE).at[order_t].set(got)


@functools.partial(jax.jit, static_argnames=(
    "grid", "rc_cells", "cell_capacity", "exact_targets", "precise"))
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
) -> jax.Array:
    """Accelerations on targets: tapered particle-mesh far field + exact
    short-range pair correction + direct-sum override for the
    ``exact_targets`` largest-radius targets. See module docstring.

    Padded target rows (``tgt_mask`` = 0, origin-pinned) are excluded from
    the adaptive box; they may consume target-cell slots near the origin but
    sort after real rows (stable order), so they overflow first. Their
    output rows are garbage-but-finite — callers mask them, as with ``pm``.
    """
    eps2 = jnp.asarray(softening, DTYPE) ** 2
    all_min, all_max = _bounds(tgt_pos, src_pos, src_gm, tgt_mask)
    lo, h = _box(all_min, all_max, grid)
    rc = rc_cells * h

    rho = _cic_scatter(src_pos, src_gm, lo, 1.0 / h, grid)
    a_grid = _solve(rho, h, eps2, grid, rc=rc)
    acc = _cic_gather(a_grid, tgt_pos, lo, 1.0 / h, grid)

    gc = max(grid // rc_cells, 1)
    cell = (grid * h) / gc  # >= rc, so d < rc pairs live in 3x3 neighbors
    acc = acc + _pp_correction(
        tgt_pos, tgt_radius, src_pos, src_gm, lo, 1.0 / cell, gc,
        cell_capacity, rc, eps2, precise)

    if exact_targets:
        from .. import forces

        k = min(exact_targets, tgt_pos.shape[0])
        _, big = jax.lax.top_k(tgt_radius, k)
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
