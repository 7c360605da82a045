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
  * Sources beyond the VMEM residency budget stream through a second,
    Mosaic-pipelined grid dimension of LARGE (3, ~131k) source blocks
    (v5, round 4), with the column accumulators carried in VMEM scratch
    and the resident kernel's chunk loop inside each block. The block
    width amortizes the per-(i, j)-grid-step fixed costs 64x (they cost
    9% at N=1M when the block was one 2048 chunk in rounds 2-3; +1.28%
    at blk=131072); manual in-kernel DMA pipelines measured strictly
    worse (+21% nested-loop / +68% flat form — see ``_stream_kernel``
    and scripts/ablations/tune_r4*). Sources unlimited; callers pad S to the chunk
    (tile_sources) only — the kernel splits S evenly into the fewest
    under-budget blocks and pads <= one chunk per block in-jit, with the
    last block's chunk loop statically shorter, so gm=0 padding costs
    (trivial) DMA, never compute.

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

from ..types import DTYPE, SOFTENING_FLOOR, round_up

# fp32 tiling: sublane multiple 8, lane multiple 128.
TARGET_ALIGN = 8
SOURCE_ALIGN = 128

# Largest source count kept fully VMEM-resident as a (3->8, S) panel
# (32 B/source after sublane padding). Above this the kernel streams source
# blocks through a second, Mosaic-pipelined grid dimension. Validated on
# v5e (16 MB VMEM) together with the default (1024, 2048) compute tile.
RESIDENT_SOURCE_MAX = 131072

# Nominal streamed source-block width (rounded to a tile_sources multiple
# by stream_block_len): the per-(i, j)-grid-step fixed costs (target
# transposes, accumulator scratch round-trips, grid prologue) cost ~9% at
# N=1M when the block equals one 2048 chunk (rounds 2-3); wide blocks
# amortize them away. Measured at N=1M (v5e, vs the jnp backend's
# 2184 ms/substep): blk 16384 +3.0%, 32768 +2.0%, 65536 +1.5%,
# 98304 +1.34%, 131072 +1.28% — monotone in width, so the block is pinned
# at the resident panel's own size. The kernel's last-block chunk count
# skips gm=0 padding COMPUTE, so the only cost of a wider block is the
# (bandwidth-trivial, <0.1%) DMA of the padded tail block.
STREAM_SRC_BLOCK = 131072

# Bounds for hardware tile choices. The in-kernel compute materializes
# (tile_t, chunk) broadcast temporaries (DESIGN.md §3), and (1024, 2048)
# already sits near the 16 MB scoped-VMEM limit — with only HALF that
# product safe in the short-source regime (S <= 4096 collapses the chunk
# loop and widens Mosaic live ranges: (1024, 2048) measured +96 KB over
# budget there, hence the 512-row cap). Every hardware tile — requested,
# halved, 128-bumped, or the whole-array fallback (capped at
# WHOLE_TARGET_MAX rows) — must stay within the regime's budget.
WHOLE_TARGET_MAX = 4096
WHOLE_BLOCK_ELEMS = 1024 * 2048


def resolve_tile_targets(t: int, tile_targets: int, s: int,
                         hardware: bool, chunk: int | None = None) -> int:
    """Pick the target-tile width the kernel will actually use.

    Halves the requested ``tile_targets`` until it divides ``t`` (the caller
    pads targets to its own tile multiple, which may be smaller than the
    request), capping at 512 for short source rows (S <= 4096 collapses the
    chunk loop and widens Mosaic live ranges — measured +96 KB over the
    16 MB scoped-VMEM budget at T=4096, S=2048).

    ``hardware=True`` (a real Mosaic lowering, i.e. ``interpret=False``)
    additionally legalizes the result against the TPU block-spec rule: the
    lane dim of a block must be a multiple of 128 OR equal to the whole
    array dim. Interpreter-sized tiles (tests use tile_targets=8) and
    targets padded only to the 8-sublane minimum satisfy neither — the
    interpreter accepts them, the hardware lowering raises. Legal fixups,
    in order: bump to exactly 128 when 128 | t; fall back to one
    whole-array block when t <= WHOLE_TARGET_MAX; otherwise fail with the
    remedy (pad targets to a multiple of 128, as World's production
    configs already do via their tile_targets). Finally, EVERY hardware
    tile — including a tile that equals t naturally and so skipped both
    the halving and the fixups — must keep the implied (tile_t, chunk)
    compute block within the regime's VMEM-safe budget (``chunk`` is the
    kernel's source-slice width, min(tile_sources, S)); over-budget
    shapes raise the actionable error instead of an opaque Mosaic
    VMEM-overflow at compile time.
    """
    if chunk is None:
        chunk = min(2048, s)
    tile_t = min(tile_targets, t)
    if s <= 4096:
        tile_t = min(tile_t, 512)
    while t % tile_t and tile_t > TARGET_ALIGN:
        tile_t //= 2
    if t % tile_t or tile_t % TARGET_ALIGN:
        raise ValueError(
            f"T={t} must be divisible by a tile <= tile_targets={tile_targets} "
            f"(align {TARGET_ALIGN})")
    if hardware:
        if tile_t % SOURCE_ALIGN and tile_t != t:
            if t % SOURCE_ALIGN == 0:
                tile_t = SOURCE_ALIGN
            elif t <= WHOLE_TARGET_MAX:
                tile_t = t
            else:
                raise ValueError(
                    f"target tile {tile_t} cannot lower on TPU: Mosaic "
                    f"requires the block's lane dim to be a multiple of "
                    f"{SOURCE_ALIGN} or the whole array, and T={t} admits "
                    f"no {SOURCE_ALIGN}-multiple tile (whole-array blocks "
                    f"are capped at T={WHOLE_TARGET_MAX}) — pad targets to "
                    f"a multiple of {SOURCE_ALIGN} (use tile_targets >= 128 "
                    f"so World pads for you)")
        budget = WHOLE_BLOCK_ELEMS // 2 if s <= 4096 else WHOLE_BLOCK_ELEMS
        if tile_t * chunk > budget:
            raise ValueError(
                f"(tile_t={tile_t}) x (chunk={chunk}) compute blocks exceed "
                f"the VMEM-safe budget ({budget} elements"
                f"{' in the short-source regime' if s <= 4096 else ''}; the "
                f"(1024, 2048) production block already sits near the 16 MB "
                f"scoped-VMEM limit) — pad targets to a multiple of "
                f"{SOURCE_ALIGN} / lower tile_targets, or lower tile_sources")
    return tile_t


def stream_block_len(tile_sources: int) -> int:
    """MAXIMUM streamed source-block width: STREAM_SRC_BLOCK rounded down
    to a positive multiple of ``tile_sources`` (the in-block chunk). The
    kernel splits S into the fewest blocks of at most this width, sized
    evenly — so actual blocks are in [this/2, this]."""
    return tile_sources * max(1, STREAM_SRC_BLOCK // tile_sources)


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
    src_ref,     # (3, s_blk) VMEM: the j-th source block, Mosaic-pipelined
    *refs,       # outputs (as _substep_kernel) + scratch: ax_scr, ay_scr
    chunk: int,
    n_full: int,
    last_full: int,
    n_j: int,
    precise: bool,
    integrate: bool,
    pos_dt: float,
):
    """Streaming-source kernel (v5): a second grid dimension walks (3,
    s_blk) source blocks, double-buffered by Mosaic's automatic pipelining;
    the (tile_t, 128) column accumulators carry across j steps in VMEM
    scratch, and an inner ``fori_loop`` walks each block in chunk slices
    (the resident kernel's exact inner structure). The LAST block runs a
    statically shorter chunk loop (``last_full``): S pads up to s_blk for
    the uniform BlockSpec, but the gm=0 padding chunks are never computed
    (exact-source semantics at chunk granularity; only the final partial
    chunk's <=2048 zero-contribution lanes remain), and the padded tail's
    DMA is bandwidth-trivial.

    Why this structure (every alternative measured, scripts/ablations/tune_r4*):
    manual in-kernel DMA forms lose 20-70% per pair — a nested block/chunk
    loop pays accumulator-carry costs at both loop levels, a flat
    chunk-granular DMA pipeline is DMA-latency-bound, and ``pl.when``
    prefetch guards break Mosaic's software pipelining of the FMA chain.
    The round-2/3 version of THIS form lost 9% at N=1M only because it
    used s_blk == chunk (2048): the per-(i, j)-step fixed costs (target
    transposes, scratch round-trips, grid prologue) repeated 257x per
    target tile. Wide blocks amortize those costs 16x."""
    ax_scr, ay_scr = refs[-2:]
    out_refs = refs[:-2]
    j = pl.program_id(1)
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

    def chunks(n, ax, ay):
        return jax.lax.fori_loop(
            0, n, lambda c, car: block(c * chunk, chunk, car[0], car[1]),
            (ax, ay))

    @pl.when(j == 0)
    def _():
        ax_scr[:] = jnp.zeros_like(ax_scr)
        ay_scr[:] = jnp.zeros_like(ay_scr)

    if n_j == 1:
        ax, ay = chunks(last_full, ax_scr[:], ay_scr[:])
        _finalize(dt_ref, tgt_ref, out_refs, ax, ay, integrate=integrate,
                  pos_dt=pos_dt)
        return

    # ONE instance of the chunk loop (and of _finalize): a second
    # instance under a disjoint pl.when branch ADDS to Mosaic's scoped
    # VMEM stack (measured 18.57M > the 16M budget at (1024, 2048) —
    # the resident compute tile sits near the limit by design). When the
    # real sources end mid-way through the last block, the trip count
    # becomes a traced select instead — same loop body, no duplication.
    if last_full == n_full:
        ax, ay = chunks(n_full, ax_scr[:], ay_scr[:])
    else:
        trip = jax.lax.select(j == n_j - 1, last_full, n_full)
        ax, ay = chunks(trip, ax_scr[:], ay_scr[:])

    @pl.when(j < n_j - 1)
    def _():
        ax_scr[:] = ax
        ay_scr[:] = ay

    @pl.when(j == n_j - 1)
    def _():
        _finalize(dt_ref, tgt_ref, out_refs, ax, ay,
                  integrate=integrate, pos_dt=pos_dt)


@functools.partial(
    jax.jit,
    static_argnames=("tile_targets", "tile_sources", "precise", "integrate",
                     "pos_dt", "interpret", "src_real"),
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
    src_real: int | None = None,
):
    t = tgt.shape[1]
    s = src.shape[1]
    if tile_sources % SOURCE_ALIGN:
        raise ValueError(
            f"tile_sources={tile_sources} must be a multiple of "
            f"{SOURCE_ALIGN} (the kernel accumulates in 128-wide slices)")
    resident = s <= max(RESIDENT_SOURCE_MAX, tile_sources)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Tile choice (512-cap for short source rows, halving to a divisor of t)
    # plus the hardware 128-lane block legalization — see the function doc.
    tile_t = resolve_tile_targets(t, tile_targets, s, hardware=not interpret,
                                  chunk=min(tile_sources, s))
    if s % SOURCE_ALIGN:
        raise ValueError(f"S={s} must be a multiple of {SOURCE_ALIGN}")

    n_out = 3 if integrate else 1
    pairs = t * s
    cost = pl.CostEstimate(
        flops=13 * pairs,
        bytes_accessed=(6 * t + 3 * s + 2 * n_out * t) * 4,
        transcendentals=pairs,
    )

    if resident:
        chunk = min(tile_sources, s)
        n_full, tail = divmod(s, chunk)
        kernel = functools.partial(
            _substep_kernel, chunk=chunk, n_full=n_full, tail=tail,
            precise=precise, integrate=integrate, pos_dt=pos_dt)
        grid = (t // tile_t,)
        tgt_spec = pl.BlockSpec((6, tile_t), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        src_spec = pl.BlockSpec((3, s), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = [pl.BlockSpec((2, tile_t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)] * n_out
        scratch = []
        semantics = ("parallel",)
    else:
        chunk = tile_sources
        if s % chunk:
            raise ValueError(
                f"streaming sources: S={s} must be a multiple of "
                f"tile_sources={chunk} (see world.source_pad_len)")
        # Split S into the fewest blocks that fit the VMEM budget, sized
        # evenly (round-robin would leave the last block nearly empty):
        # padding to the uniform BlockSpec is then <= one chunk per block,
        # added HERE inside the jit (fused, gm=0 rows => zero force), so
        # callers never pad beyond chunk alignment and per-shard source
        # rows (parallel/sharding.py) carry no stream-block dead weight.
        n_j = -(-s // stream_block_len(chunk))
        s_blk = round_up(-(-s // n_j), chunk)
        s_pad = n_j * s_blk
        if s_pad > s:
            src = jnp.pad(src, ((0, 0), (0, s_pad - s)))
        n_full = s_blk // chunk
        # Real (unpadded) sources end inside the last block: its chunk
        # loop is statically shorter, so gm=0 padding costs no compute
        # (callers that know mass_len pass it as src_real; the jit-added
        # pad above is skipped even without it since real <= s).
        real = min(src_real or s, s)
        if real <= (n_j - 1) * s_blk:
            raise ValueError(
                f"src_real={src_real} leaves the last stream block empty "
                f"(S={s}, block {s_blk}) — the source row is over-padded")
        last_full = -(-(real - (n_j - 1) * s_blk) // chunk)
        kernel = functools.partial(
            _stream_kernel, chunk=chunk, n_full=n_full,
            last_full=last_full, n_j=n_j, precise=precise,
            integrate=integrate, pos_dt=pos_dt)
        grid = (t // tile_t, n_j)
        tgt_spec = pl.BlockSpec((6, tile_t), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)
        src_spec = pl.BlockSpec((3, s_blk), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
        out_spec = [pl.BlockSpec((2, tile_t), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM)] * n_out
        scratch = [pltpu.VMEM((tile_t, 128), DTYPE)] * 2
        semantics = ("parallel", "arbitrary")

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), tgt_spec, src_spec],
        out_specs=out_spec,
        out_shape=[jax.ShapeDtypeStruct((2, t), DTYPE)] * n_out,
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
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
    src_real: int | None = None,
):
    """One fused substep (force + integrate) in a single kernel launch.

    ``src_real`` (static) is the real (unpadded) source count; in
    streaming mode the kernel then skips the gm=0 padding chunks of the
    last source block entirely.

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
        precise=precise, integrate=True, pos_dt=pos_dt, interpret=interpret,
        src_real=src_real)
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
    src_real: int | None = None,
) -> jax.Array:
    """Compute accelerations with the tiled Pallas kernel (no integration).

    Args:
      tgt_pos: (T, 2) target positions; T must be a multiple of
        min(tile_targets, T).
      tgt_radius: (T,) target radii.
      src_pos: (S, 2) source positions; S must be a multiple of 128
        (SOURCE_ALIGN). Exact-source semantics: no tile_sources padding
        required (particle_cs.glsl:35 loops to mass_len exactly). Beyond
        the VMEM residency budget (RESIDENT_SOURCE_MAX) S must instead be
        a multiple of the stream block (world.source_pad_len pads so).
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
        precise=precise, integrate=False, pos_dt=1.0, interpret=interpret,
        src_real=src_real)
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
