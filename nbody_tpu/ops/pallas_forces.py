"""Tiled O(N*M) pairwise-gravity Pallas TPU kernel (v2, round 2).

TPU-native counterpart of the reference's Vulkan compute shader
(``src/shader/particle_cs.glsl:28-55``) and its dispatch machinery
(``src/lib/sim_gpu.c:258-361``). Same math, fp32:

  radv = src - tgt; r2 = |radv|^2 + tgt.radius;  acc += radv * G*m / r2^{3/2}

Design (v2 — what round-1 measurement taught us):

  * Grid over TARGET tiles only ("parallel"); the (3, S) source panel
    (x, y, G*mass rows) sits VMEM-resident and an in-kernel ``fori_loop``
    walks it in ``chunk``-wide slices. This removes the per-(i, j)-grid-step
    costs of the round-1 2D grid (~0.5 µs/step x 2176 steps at N=65k).
  * EXACT ``mass_len`` sources: the source row is padded to the 128-lane
    minimum only (not to ``tile_sources``), and a statically-sized tail
    chunk handles the remainder — the reference kernel's exact loop bound
    (``particle_cs.glsl:35``), which the round-1 kernel lacked (it forced
    ~6% dead work at N=65k and lost its own benchmark to XLA).
  * Accumulation into (tile_t, 128) vreg-column partial sums via 128-wide
    slice multiply-adds (FMA-friendly), with the cross-lane reduction
    deferred to once per target tile — measurably cheaper than a full
    ``jnp.sum`` per chunk, and it lowers live-temp pressure enough to run
    (1024 x 2048) blocks inside the 16 MB VMEM budget.
  * Target rows arrive as a packed (6, tile_t) block ((1, x)-row layout; a
    (T, 1) column layout lane-pads 128x in VMEM) and are transposed to
    (tile_t, 1) columns in-kernel — once per tile, amortized over S.
  * Optional fused integration epilogue: semi-implicit Euler
    (``particle_cs.glsl:51-52``) or the second half of position-Verlet
    (``pos_dt=0.5``) applied in-kernel, so ``backend="pallas"`` is ONE
    kernel launch per substep with no XLA glue.
  * Sources beyond the VMEM residency budget stream with in-kernel
    double-buffered ``make_async_copy`` DMA (v4, round 4 — the ring
    kernel's pattern, ``ring_forces.py``): the source panel stays in
    compiler-chosen (HBM) memory and chunk-wide tiles prefetch through two
    single-chunk VMEM buffers while the other buffer feeds the force
    loop — one flat pair-unrolled loop with a guard-free body (see
    ``_stream_kernel`` for the measured structure rules). The grid stays
    1-D over target tiles, so the per-(i, j)-grid-step costs of the
    round-2/3 second-grid-dimension form (target-row transposes,
    accumulator scratch round-trips, Mosaic grid prologue — the measured
    -9% at N=1M, docs/BENCHMARKS.md) are paid once per target tile.
    Sources unlimited; tail padding is <= tile_sources/S (~0.4% at N=1M).

The ``mass_len`` boundary inside a 128-lane tail is handled with the
reference's own zero-pad trick (``sim_cpu.c:133-142``): padding sources
carry ``gm == 0`` and contribute exactly zero. The ``total_len`` guard
(``particle_cs.glsl:30``) is the caller's validity mask on padded target
rows (masked in the epilogue here when integrating).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE, SOFTENING_FLOOR

# fp32 tiling: sublane multiple 8, lane multiple 128.
TARGET_ALIGN = 8
SOURCE_ALIGN = 128

# Largest source count kept fully VMEM-resident as a (3->8, S) panel
# (32 B/source after sublane padding). Above this the kernel streams source
# tiles from HBM with in-kernel double-buffered DMA. Validated on v5e
# (16 MB VMEM) together with the default (1024, 2048) compute tile.
RESIDENT_SOURCE_MAX = 131072

# Target-tile cap for the streaming kernel: the in-kernel DMA machinery +
# nested block/chunk loops raise Mosaic's scoped-VMEM stack high enough
# that a (1024, 2048) compute tile overflows the 16 MB budget (measured
# +688 KB); 512 leaves ample headroom at every streamed shape.
STREAM_TILE_CAP = 512

# Grid-dimension semantics of the streaming kernel (probe knob): the DMA
# machinery is self-contained per grid step (every copy started in a step
# is waited in that step), so "parallel" is semantically safe too.
STREAM_DIM_SEMANTICS = "arbitrary"


def _pair_chunk(tx, ty, tr, sx, sy, gm, ax, ay, *, precise: bool):
    """One (tile_t, size) pairwise force block accumulated into the
    (tile_t, 128) vreg-column partial sums via 128-wide slice FMAs."""
    dx = sx - tx
    dy = sy - ty
    r2 = dx * dx + dy * dy + tr  # softened: + target radius (glsl:41)
    if precise:
        # Exact sqrt + divide, matching the shader (glsl:42-48).
        f = gm / (jnp.sqrt(r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        f = gm * (inv * inv * inv)
    # 128-wide slice multiply-adds into vreg-column partials.
    size = sx.shape[1]
    for k in range(size // 128):
        a, b = k * 128, (k + 1) * 128
        ax = ax + dx[:, a:b] * f[:, a:b]
        ay = ay + dy[:, a:b] * f[:, a:b]
    return ax, ay


def _finalize(dt_ref, tgt_ref, out_refs, ax, ay, *, integrate: bool,
              pos_dt: float):
    """Cross-lane reduce of the column partials, then the optional in-kernel
    integration epilogue (Euler pos_dt=1 / kick+half-drift pos_dt=0.5)."""
    arow = jnp.transpose(jnp.sum(ax, axis=1, keepdims=True))  # (1, tile_t)
    brow = jnp.transpose(jnp.sum(ay, axis=1, keepdims=True))
    if integrate:
        # padding rows masked (the shader's total_len guard, glsl:30)
        valid = tgt_ref[5:6, :]
        arow = arow * valid
        brow = brow * valid
        dt = dt_ref[0, 0]
        nvx = tgt_ref[3:4, :] + dt * arow
        nvy = tgt_ref[4:5, :] + dt * brow
        acc_ref, pos_ref, vel_ref = out_refs
        pdt = pos_dt * dt
        pos_ref[0:1, :] = tgt_ref[0:1, :] + pdt * nvx
        pos_ref[1:2, :] = tgt_ref[1:2, :] + pdt * nvy
        vel_ref[0:1, :] = nvx
        vel_ref[1:2, :] = nvy
        acc_ref[0:1, :] = arow
        acc_ref[1:2, :] = brow
    else:
        (acc_ref,) = out_refs
        acc_ref[0:1, :] = arow
        acc_ref[1:2, :] = brow


def _substep_kernel(
    dt_ref,      # (1, 1) SMEM
    tgt_ref,     # (6, tile_t) VMEM: pos x, pos y, radius, vel x, vel y, valid
    src_ref,     # (3, S) VMEM: x, y, gm (fully resident)
    *out_refs,   # acc (2, tile_t) [+ pos (2, tile_t), vel (2, tile_t)]
    chunk: int,
    n_full: int,
    tail: int,
    precise: bool,
    integrate: bool,
    pos_dt: float,
):
    tx = jnp.transpose(tgt_ref[0:1, :])  # (tile_t, 1)
    ty = jnp.transpose(tgt_ref[1:2, :])
    tr = jnp.transpose(tgt_ref[2:3, :])
    tile_t = tx.shape[0]

    def block(off, size, ax, ay):
        return _pair_chunk(
            tx, ty, tr,
            src_ref[0:1, pl.ds(off, size)],
            src_ref[1:2, pl.ds(off, size)],
            src_ref[2:3, pl.ds(off, size)],
            ax, ay, precise=precise)

    zero = jnp.zeros((tile_t, 128), DTYPE)
    ax, ay = jax.lax.fori_loop(
        0, n_full, lambda c, car: block(c * chunk, chunk, car[0], car[1]),
        (zero, jnp.zeros_like(zero)))
    if tail:
        ax, ay = block(n_full * chunk, tail, ax, ay)
    _finalize(dt_ref, tgt_ref, out_refs, ax, ay, integrate=integrate,
              pos_dt=pos_dt)


def _stream_kernel(
    dt_ref,      # (1, 1) SMEM
    tgt_ref,     # (6, tile_t) VMEM: pos x, pos y, radius, vel x, vel y, valid
    src_ref,     # (4, S) ANY (HBM at these sizes): x, y, gm, dead pad row
    *refs,       # outputs (as _substep_kernel) + scratch: sbuf0, sbuf1, sem
    chunk: int,
    n_chunks: int,
    precise: bool,
    integrate: bool,
    pos_dt: float,
):
    """Streaming-source kernel (v4): the (3, S) panel stays in
    compiler-chosen (HBM) memory; (3, chunk) tiles prefetch into two
    separate single-chunk VMEM scratch buffers with explicit DMA while the
    other buffer feeds the force math. Structure lessons (each variant
    measured at N=1M / S~130k forced-stream, scripts/tune_r4*):

      * ONE flat loop, unrolled by 2 so every slot reference is a
        trace-time-static buffer object — a nested block/chunk loop costs
        ~20% per PAIR (the (tile_t, 128)x2 accumulator carry crosses two
        fori_loop boundaries), and a dynamic-slot 3-D scratch read costs
        the same again.
      * NO conditionals in the loop body: a ``pl.when`` prefetch guard
        breaks Mosaic's software pipelining of the FMA chain. The main
        loop covers the pairs whose next-next prefetches are all valid
        (n_chunks - 2 chunks), and the last 2-3 chunks run as a static
        epilogue.
      * Full-width STATIC reads of the chunk buffer (buffer width ==
        chunk), matching the resident kernel's innermost structure.

    The panel carries a dead 4th row: HBM memrefs tile dim 0 by 4, and DMA
    slices must be tile-aligned (same constraint as ring_forces.py). The
    caller pads S to a chunk multiple (<= tile_sources/S dead work, ~0.4%
    at N=1M; padding rows carry gm = 0 and contribute exactly zero)."""
    sbuf0, sbuf1, sem = refs[-3:]
    out_refs = refs[:-3]
    bufs = (sbuf0, sbuf1)
    tx = jnp.transpose(tgt_ref[0:1, :])  # (tile_t, 1)
    ty = jnp.transpose(tgt_ref[1:2, :])
    tr = jnp.transpose(tgt_ref[2:3, :])
    tile_t = tx.shape[0]

    def dma(j, slot):
        """Copy descriptor for chunk ``j`` (may be traced) into ``slot``
        (ALWAYS a Python int selecting one of the two 2-D buffers)."""
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(j * chunk, chunk)],
            bufs[slot].at[:, :],
            sem.at[slot])

    def compute(slot, ax, ay):
        buf = bufs[slot]
        return _pair_chunk(tx, ty, tr, buf[0:1, :], buf[1:2, :],
                           buf[2:3, :], ax, ay, precise=precise)

    zero = jnp.zeros((tile_t, 128), DTYPE)
    ax, ay = zero, jnp.zeros_like(zero)
    dma(0, 0).start()
    if n_chunks == 1:
        dma(0, 0).wait()
        ax, ay = compute(0, ax, ay)
    else:
        dma(1, 1).start()
        # Main loop: guard-free — every start() below lands on a valid
        # chunk index because the final 2-3 chunks are excluded.
        n_pairs = (n_chunks - 2) // 2
        rest = n_chunks - 2 * n_pairs  # 2 or 3

        def pair_body(p, car):
            ax, ay = car
            j = 2 * p
            dma(j, 0).wait()
            ax, ay = compute(0, ax, ay)
            dma(j + 2, 0).start()
            dma(j + 1, 1).wait()
            ax, ay = compute(1, ax, ay)
            dma(j + 3, 1).start()
            return ax, ay

        if n_pairs:
            ax, ay = jax.lax.fori_loop(0, n_pairs, pair_body, (ax, ay))
        # Epilogue: chunks [2*n_pairs, n_chunks) — their slot-0/1 DMAs were
        # started by the last pair iteration (or the seeds when n_pairs=0).
        j = 2 * n_pairs
        dma(j, 0).wait()
        ax, ay = compute(0, ax, ay)
        if rest == 3:
            dma(j + 2, 0).start()
        dma(j + 1, 1).wait()
        ax, ay = compute(1, ax, ay)
        if rest == 3:
            dma(j + 2, 0).wait()
            ax, ay = compute(0, ax, ay)
    _finalize(dt_ref, tgt_ref, out_refs, ax, ay, integrate=integrate,
              pos_dt=pos_dt)


@functools.partial(
    jax.jit,
    static_argnames=("tile_targets", "tile_sources", "precise", "integrate",
                     "pos_dt", "interpret"),
)
def _substep_call(
    dt: jax.Array,
    tgt: jax.Array,    # (6, T) rows: pos x, pos y, radius, vel x, vel y, valid
    src: jax.Array,    # (3, S) rows: x, y, gm (zero-padded to 128 lanes)
    *,
    tile_targets: int,
    tile_sources: int,
    precise: bool,
    integrate: bool,
    pos_dt: float,
    interpret: bool | None,
):
    t = tgt.shape[1]
    s = src.shape[1]
    if tile_sources % SOURCE_ALIGN:
        raise ValueError(
            f"tile_sources={tile_sources} must be a multiple of "
            f"{SOURCE_ALIGN} (the kernel accumulates in 128-wide slices)")
    resident = s <= max(RESIDENT_SOURCE_MAX, tile_sources)
    tile_t = min(tile_targets, t)
    # Short source rows collapse the chunk loop (n_full <= 1), which widens
    # Mosaic live ranges enough that a (1024, 2048) block overflows the 16MB
    # scoped-VMEM budget (measured: +96KB at T=4096, S=2048). Cap the target
    # tile at 512 there; the loss is negligible at those latency-bound sizes.
    if s <= 4096:
        tile_t = min(tile_t, 512)
    if not resident:
        tile_t = min(tile_t, STREAM_TILE_CAP)  # see STREAM_TILE_CAP note
    while t % tile_t and tile_t > TARGET_ALIGN:
        tile_t //= 2
    if t % tile_t or tile_t % TARGET_ALIGN:
        raise ValueError(
            f"T={t} must be divisible by a tile <= tile_targets={tile_targets} "
            f"(align {TARGET_ALIGN})")
    if s % SOURCE_ALIGN:
        raise ValueError(f"S={s} must be a multiple of {SOURCE_ALIGN}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if resident:
        chunk = min(tile_sources, s)
        n_full, tail = divmod(s, chunk)
        kernel = functools.partial(
            _substep_kernel, chunk=chunk, n_full=n_full, tail=tail,
            precise=precise, integrate=integrate, pos_dt=pos_dt)
        src_spec = pl.BlockSpec((3, s), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        scratch = []
        has_dma = False
    else:
        chunk = tile_sources
        if s % chunk:
            raise ValueError(
                f"streaming sources: S={s} must be a multiple of "
                f"tile_sources={chunk}")
        kernel = functools.partial(
            _stream_kernel, chunk=chunk, n_chunks=s // chunk,
            precise=precise, integrate=integrate, pos_dt=pos_dt)
        src_spec = pl.BlockSpec(memory_space=pl.ANY)
        # dead 4th panel row: HBM memrefs tile dim 0 by 4 and DMA slices
        # must be tile-aligned (ring_forces.py has the same pad)
        src = jnp.concatenate([src, jnp.zeros((1, s), DTYPE)], axis=0)
        scratch = [pltpu.VMEM((4, chunk), DTYPE),
                   pltpu.VMEM((4, chunk), DTYPE),
                   pltpu.SemaphoreType.DMA((2,))]
        has_dma = True

    n_out = 3 if integrate else 1
    pairs = t * s
    cost = pl.CostEstimate(
        flops=13 * pairs,
        bytes_accessed=(6 * t + 3 * s + 2 * n_out * t) * 4,
        transcendentals=pairs,
    )
    grid = (t // tile_t,)
    tgt_spec = pl.BlockSpec((6, tile_t), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = [pl.BlockSpec((2, tile_t), lambda i: (0, i),
                             memory_space=pltpu.VMEM)] * n_out

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), tgt_spec, src_spec],
        out_specs=out_spec,
        out_shape=[jax.ShapeDtypeStruct((2, t), DTYPE)] * n_out,
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                (STREAM_DIM_SEMANTICS,) if has_dma else ("parallel",)),
        ),
        interpret=interpret,
    )(jnp.asarray(dt, DTYPE).reshape(1, 1), tgt, src)
    return out


def _rows_to_cols(rows: jax.Array) -> jax.Array:
    return jnp.transpose(rows)  # (2, T) -> (T, 2)


def fused_substep(
    dt,
    pos: jax.Array,      # (T, 2)
    vel: jax.Array,      # (T, 2)
    radius: jax.Array,   # (T,)
    valid: jax.Array,    # (T, 1)
    src: jax.Array,      # (3, S): x, y, gm
    *,
    tile_targets: int = 1024,
    tile_sources: int = 2048,
    precise: bool = False,
    pos_dt: float = 1.0,
    interpret: bool | None = None,
):
    """One fused substep (force + integrate) in a single kernel launch.

    ``pos_dt=1.0`` gives the reference's semi-implicit Euler
    (``v += a*dt; x += v*dt``, particle_cs.glsl:51-52). ``pos_dt=0.5`` is
    the kick-plus-half-drift used as the second half of position-Verlet
    (the caller pre-drifts positions by dt/2).

    Returns (new_pos, new_vel, acc), each (T, 2).
    """
    # radius row is only read as the r2 softening term, so the NaN-guarding
    # floor (types.SOFTENING_FLOOR) can be folded in at pack time for free.
    tgt = jnp.concatenate(
        [jnp.transpose(pos), radius[None, :] + SOFTENING_FLOOR,
         jnp.transpose(vel), jnp.transpose(valid)], axis=0)
    acc, npos, nvel = _substep_call(
        dt, tgt, src,
        tile_targets=tile_targets, tile_sources=tile_sources,
        precise=precise, integrate=True, pos_dt=pos_dt, interpret=interpret)
    return _rows_to_cols(npos), _rows_to_cols(nvel), _rows_to_cols(acc)


def pallas_acc(
    tgt_pos: jax.Array,
    tgt_radius: jax.Array,
    src_pos: jax.Array,
    src_gm: jax.Array,
    *,
    tile_targets: int = 1024,
    tile_sources: int = 2048,
    precise: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Compute accelerations with the tiled Pallas kernel (no integration).

    Args:
      tgt_pos: (T, 2) target positions; T must be a multiple of
        min(tile_targets, T).
      tgt_radius: (T,) target radii.
      src_pos: (S, 2) source positions; S must be a multiple of 128
        (SOURCE_ALIGN). Exact-source semantics: no tile_sources padding
        required (particle_cs.glsl:35 loops to mass_len exactly).
      src_gm: (S,) G*mass per source, zero for padding / non-exerting rows.
      interpret: run in interpreter mode (auto-on for non-TPU backends so the
        same code path is testable on the CPU mesh).

    Returns:
      (T, 2) fp32 accelerations.
    """
    t = tgt_pos.shape[0]
    tgt = jnp.concatenate(
        [jnp.transpose(tgt_pos), tgt_radius[None, :] + SOFTENING_FLOOR,
         jnp.zeros((3, t), DTYPE)], axis=0)
    src = jnp.concatenate(
        [jnp.transpose(src_pos), src_gm[None, :]], axis=0)
    (acc,) = _substep_call(
        jnp.float32(0.0), tgt, src,
        tile_targets=tile_targets, tile_sources=tile_sources,
        precise=precise, integrate=False, pos_dt=1.0, interpret=interpret)
    return _rows_to_cols(acc)


@functools.lru_cache(maxsize=None)
def make_differentiable_acc(
    tile_targets: int = 1024,
    tile_sources: int = 2048,
    precise: bool = False,
    interpret: bool | None = None,
):
    """Differentiable wrapper around the Pallas kernel (guide pattern:
    custom VJP for production kernels).

    Forward = the Pallas kernel. Backward = the VJP of the mathematically
    identical jnp formulation, recomputed at backward time (only the four
    input arrays are saved as residuals — O(N) memory, no O(N*S) residuals).
    This makes jax.grad flow through rollouts that use the fast kernel.
    """
    from .. import forces

    def _jnp_equiv(tp, tr, sp, sg):
        chunk = min(tile_targets, tp.shape[0])
        return forces.direct_sum_acc(tp, tr, sp, sg, chunk=chunk, precise=precise)

    @jax.custom_vjp
    def acc(tp, tr, sp, sg):
        return pallas_acc(
            tp, tr, sp, sg,
            tile_targets=tile_targets, tile_sources=tile_sources,
            precise=precise, interpret=interpret,
        )

    def fwd(tp, tr, sp, sg):
        return acc(tp, tr, sp, sg), (tp, tr, sp, sg)

    def bwd(res, g):
        tp, tr, sp, sg = res
        _, vjp = jax.vjp(_jnp_equiv, tp, tr, sp, sg)
        return vjp(g)

    acc.defvjp(fwd, bwd)
    return acc
