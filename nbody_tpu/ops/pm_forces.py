"""Particle-mesh (PM) far-field gravity: O(N + G^2 log G) per substep.

Beyond-reference capability (the reference is direct-sum only,
``particle_cs.glsl:35-49``): an approximate long-range solver for very large
N, built from TPU-friendly primitives only — CIC scatter-add, 2-D real FFTs
(XLA-native), a pointwise spectral multiply, and CIC gather. No trees, no
data-dependent control flow, static shapes: everything jits and shards.

Physics: the same force law as the reference — 3-D-like softened inverse
square restricted to the plane, ``acc_i = sum_j G m_j (s_j - t_i) /
(|s_j - t_i|^2 + eps^2)^{3/2}`` — evaluated by free-space convolution:

  rho  = CIC(src, gm)                      (G, G) mass grid
  A_x  = conv(rho, Kx),  Kx(v) = v_x / (|v|^2 + eps^2)^{3/2}
  acc  = CIC-gather(A_x, A_y)(targets)

The convolution is linear (zero-padded to 2G per axis — true free-space
boundaries, no periodic images). The grid box adapts to the particle
bounding square every call with *traced* bounds, so one compilation serves
the whole simulation while the box follows the system.

Approximation error vs the direct sum: pairs separated by >~ 3 grid cells
are accurate to the CIC/kernel discretization (~h^2); sub-cell pairs are
smoothed to the global softening ``eps`` instead of the reference's
per-target ``+ radius`` term. Accuracy therefore improves with ``grid`` and
degrades for close encounters — this is a far-field solver; the exact
backends remain the parity reference. See tests/test_pm.py for measured
error envelopes and BENCHMARKS.md for the N=1M speedup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import DTYPE


def suggest_grid(n: int, lo: int = 256, hi: int = 4096) -> int:
    """Measured-optimal mesh resolution for ``n`` particles: the next power
    of two >= sqrt(n), clamped to [lo, hi].

    The v5e sweep behind this (docs/BENCHMARKS.md): at N=1M grid 1024 beats
    2048 (22 vs 54 ms/substep — the doubled FFT/patch-table cost buys
    accuracy the CIC already delivers at ~1 particle/cell), at 262k grid
    512-1024 tie, at 4M+ grid 2048 tracks. sqrt(N) keeps ~1 particle per
    cell; raise it (and accept the cost) when force-error tails matter more
    than speed, or use backend="p3m" which fixes the tails exactly."""
    g = 1
    while g * g < n:
        g <<= 1
    return max(lo, min(hi, g))


def _cic_weights(pos, lo, inv_h, grid):
    """Cloud-in-cell: cell index pairs and bilinear weights for each point.

    Cell centers sit at lo + (i + 0.5) h. Returns (i0, j0, wx, wy) with the
    four corners (i0, j0)..(i0+1, j0+1); indices clamped into the grid."""
    u = (pos[:, 0] - lo[0]) * inv_h - 0.5
    v = (pos[:, 1] - lo[1]) * inv_h - 0.5
    i0 = jnp.floor(u)
    j0 = jnp.floor(v)
    wx = u - i0
    wy = v - j0
    i0 = jnp.clip(i0.astype(jnp.int32), 0, grid - 2)
    j0 = jnp.clip(j0.astype(jnp.int32), 0, grid - 2)
    return i0, j0, wx, wy


def _bounds(tgt_pos, src_pos, src_gm, tgt_mask):
    """Masked bounding box over real sources and targets (padding rows are
    origin-pinned and must not inflate the grid)."""
    src_real = src_gm != 0.0
    s_min = jnp.min(jnp.where(src_real[:, None], src_pos, jnp.inf), axis=0)
    s_max = jnp.max(jnp.where(src_real[:, None], src_pos, -jnp.inf), axis=0)
    if tgt_mask is not None:
        t_real = jnp.reshape(tgt_mask, (-1,)) != 0.0
        t_min = jnp.min(jnp.where(t_real[:, None], tgt_pos, jnp.inf), axis=0)
        t_max = jnp.max(jnp.where(t_real[:, None], tgt_pos, -jnp.inf), axis=0)
    else:
        t_min = tgt_pos.min(axis=0)
        t_max = tgt_pos.max(axis=0)
    return jnp.minimum(t_min, s_min), jnp.maximum(t_max, s_max)


def _box(all_min, all_max, grid):
    all_min = jnp.where(jnp.isfinite(all_min), all_min, 0.0)
    all_max = jnp.where(jnp.isfinite(all_max), all_max, 1.0)
    center = 0.5 * (all_min + all_max)
    half = 0.5 * jnp.max(all_max - all_min) * (1.0 + 4.0 / grid) + 1e-3
    lo = center - half
    h = 2.0 * half / grid
    return lo, h


def _cic_scatter(src_pos, src_gm, lo, inv_h, grid):
    i0, j0, wx, wy = _cic_weights(src_pos, lo, inv_h, grid)
    rho = jnp.zeros((grid, grid), DTYPE)
    for di, dj, w in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        rho = rho.at[i0 + di, j0 + dj].add(src_gm * w)
    return rho


def _solve(rho, h, eps2, grid, rc=None):
    """Free-space convolution of the mass grid with the softened 1/r^2
    kernel; returns the stacked (G, G, 2) force grid.

    ``rc`` (optional, traced): multiply the kernel by a smootherstep taper
    g(r/rc) — zero at the origin, identity beyond rc. Used by the P³M
    backend (ops/p3m_forces.py), whose PP stage supplies the exact force for
    pairs inside rc; the taper keeps the grid from carrying sub-cell
    structure it cannot represent."""
    n2 = 2 * grid
    idx = jnp.arange(n2)
    d = jnp.where(idx < grid, idx, idx - n2).astype(DTYPE)  # wraparound order
    dx = d[:, None] * h
    dy = d[None, :] * h
    dist2 = dx * dx + dy * dy
    r2 = dist2 + eps2
    inv_r3 = jax.lax.rsqrt(r2) / r2
    # guard the zero-displacement sample: with eps=0 it is 0*inf -> NaN
    inv_r3 = jnp.where(r2 > 0.0, inv_r3, 0.0)
    if rc is not None:
        from .p3m_forces import _taper

        inv_r3 = inv_r3 * _taper(dist2, rc)
    kx = dx * inv_r3
    ky = dy * inv_r3
    rho_pad = jnp.zeros((n2, n2), DTYPE).at[:grid, :grid].set(rho)
    f_rho = jnp.fft.rfft2(rho_pad)
    # A(c) = sum_{c'} rho(c') K(c' - c): correlation; K odd => minus conv.
    ax_grid = -jnp.fft.irfft2(f_rho * jnp.fft.rfft2(kx), s=(n2, n2))
    ay_grid = -jnp.fft.irfft2(f_rho * jnp.fft.rfft2(ky), s=(n2, n2))
    return jnp.stack([ax_grid[:grid, :grid], ay_grid[:grid, :grid]], axis=-1)


def _cic_gather(a_grid, tgt_pos, lo, inv_h, grid):
    """Bilinear 4-corner gather from the stacked (G, G, 2) force grid.

    Shaped for TPU gather economics (measured, scripts/ablations/tune_r3d_cic.py):
    XLA's gather costs ~6-9 ns per INDEX almost independent of how many
    contiguous bytes each index moves, so the 8 element-gathers per target
    (4 corners x 2 channels) are folded into ONE row-gather: the grid is
    pre-flattened into a (G^2, 8) patch table — row c holds the full 2x2x2ch
    patch of cell c, built from 4 statically shifted views (a relayout, no
    gather) — and each target fetches its 32-byte patch row with a single
    index. 38.7 -> 8.9 ms at N=1M, G=512, bit-identical results. The same
    per-index argument says nothing is gained below one index per target,
    and the scatter counterpart measured *slower* as row-scatter (50 vs
    31 ms — scatter-add rows don't coalesce), so the scatter keeps its
    4-element form."""
    n = tgt_pos.shape[0]
    i0, j0, wx, wy = _cic_weights(tgt_pos, lo, inv_h, grid)
    # padding only completes the shifted views: i0, j0 are clipped to
    # grid-2, so the padded row/col is never addressed
    ap = jnp.pad(a_grid, ((0, 1), (0, 1), (0, 0)))
    tab = jnp.concatenate(
        [ap[:grid, :grid], ap[1:grid + 1, :grid],
         ap[:grid, 1:grid + 1], ap[1:grid + 1, 1:grid + 1]],
        axis=-1).reshape(grid * grid, 8)
    rows = tab[i0 * grid + j0]                                   # (N, 8)
    w = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                   (1 - wx) * wy, wx * wy], axis=-1)             # (N, 4)
    return (rows.reshape(n, 4, 2) * w[..., None]).sum(1).astype(DTYPE)


def pm_acc_collective(
    tgt_pos, src_pos, src_gm, softening=2.0, *, grid: int = 512,
    tgt_mask=None, axis_name: str,
):
    """Sharded particle-mesh (call inside shard_map): every device scatters
    its local source shard into a grid, ONE psum over the mesh combines the
    mass grids (O(G^2) over ICI — independent of N), the convolution solve
    runs replicated, and each device gathers only its local targets. The
    box is agreed globally via pmin/pmax, so all shards use one mesh."""
    eps2 = jnp.asarray(softening, DTYPE) ** 2
    # the adaptive box is a discretization choice, not part of the physics —
    # stop_gradient keeps reverse-mode AD out of pmin/pmax (which have no
    # differentiation rule) without changing the value
    all_min, all_max = _bounds(
        jax.lax.stop_gradient(tgt_pos), jax.lax.stop_gradient(src_pos),
        jax.lax.stop_gradient(src_gm), tgt_mask)
    all_min = jax.lax.pmin(all_min, axis_name)
    all_max = jax.lax.pmax(all_max, axis_name)
    lo, h = _box(all_min, all_max, grid)
    rho = _cic_scatter(src_pos, src_gm, lo, 1.0 / h, grid)
    rho = jax.lax.psum(rho, axis_name)
    a_grid = _solve(rho, h, eps2, grid)
    return _cic_gather(a_grid, tgt_pos, lo, 1.0 / h, grid)


@functools.partial(jax.jit, static_argnames=("grid",))
def pm_acc(
    tgt_pos: jax.Array,   # (T, 2)
    src_pos: jax.Array,   # (S, 2)
    src_gm: jax.Array,    # (S,)  G*mass (zero rows are inert, as everywhere)
    softening: jax.Array | float = 2.0,
    *,
    grid: int = 512,
    tgt_mask: jax.Array | None = None,
) -> jax.Array:
    """Far-field accelerations on targets from sources via particle-mesh.

    ``softening`` is a single global Plummer length (the PM analogue of the
    reference's per-target ``+ radius``); it is traced, so changing it never
    recompiles. ``grid`` is static (one compile per resolution).
    ``tgt_mask`` (optional (T,) or (T,1) 0/1 row) excludes padding targets
    from the adaptive box (their gathered values are garbage-but-finite and
    the caller masks them); zero-``gm`` sources are likewise excluded, so a
    world padded with origin-pinned rows does not inflate the grid box.

    The adaptive box is computed under ``stop_gradient``: it is a
    discretization choice, not physics, and differentiating through it both
    injects a min/max subgradient artifact and diverges from the collective
    path (where ``pmin`` has no differentiation rule at all).
    """
    eps2 = jnp.asarray(softening, DTYPE) ** 2
    all_min, all_max = _bounds(
        jax.lax.stop_gradient(tgt_pos), jax.lax.stop_gradient(src_pos),
        jax.lax.stop_gradient(src_gm), tgt_mask)
    lo, h = _box(all_min, all_max, grid)
    rho = _cic_scatter(src_pos, src_gm, lo, 1.0 / h, grid)
    a_grid = _solve(rho, h, eps2, grid)
    return _cic_gather(a_grid, tgt_pos, lo, 1.0 / h, grid)
