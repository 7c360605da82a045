"""Tiled O(N*M) pairwise-gravity Pallas TPU kernel.

TPU-native counterpart of the reference's Vulkan compute shader
(``src/shader/particle_cs.glsl:28-55``) and its dispatch machinery
(``src/lib/sim_gpu.c:258-361``). Same math, fp32:

  radv = src - tgt; r2 = |radv|^2 + tgt.radius;  acc += radv * G*m / r2^{3/2}

Design (instead of one GPU invocation per particle with an O(mass_len) scalar
loop): a 2D Pallas grid over (target-tile, source-tile). Each program holds a
(TT, 1) column of targets and a (1, TS) row of sources in VMEM and computes the
full (TT, TS) pairwise interaction block on the VPU, accumulating into a
(TT, 1) output block that is revisited across the source dimension (the
innermost grid axis, so the accumulator stays VMEM-resident). Arithmetic
intensity is ~TT flops per streamed source byte, so the kernel is
compute-bound for any reasonable TT.

The ``mass_len`` boundary is handled with the reference's own zero-pad trick
(``sim_cpu.c:133-142``): sources beyond ``mass_len`` carry ``gm == 0`` and
contribute exactly zero — no branches in the kernel. The ``total_len`` guard
(``particle_cs.glsl:30``) becomes padded target rows whose output is masked by
the integrator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE

# fp32 tiling: sublane multiple 8, lane multiple 128.
TARGET_ALIGN = 8
SOURCE_ALIGN = 128


def _acc_kernel(tx_ref, ty_ref, tr_ref, sx_ref, sy_ref, sgm_ref, ax_ref, ay_ref, *, precise: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ax_ref[:] = jnp.zeros_like(ax_ref)
        ay_ref[:] = jnp.zeros_like(ay_ref)

    # (TT, 1) op (1, TS) -> (TT, TS) broadcast on the VPU.
    dx = sx_ref[:] - tx_ref[:]
    dy = sy_ref[:] - ty_ref[:]
    dist_sq = dx * dx + dy * dy
    r2 = dist_sq + tr_ref[:]  # softened: + target radius (particle_cs.glsl:41)
    if precise:
        # Exact sqrt + divide, matching the shader (particle_cs.glsl:42-48).
        f = sgm_ref[:] / (jnp.sqrt(r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        f = sgm_ref[:] * (inv * inv * inv)
    ax_ref[:] += jnp.sum(dx * f, axis=1, keepdims=True)
    ay_ref[:] += jnp.sum(dy * f, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("tile_targets", "tile_sources", "precise", "interpret")
)
def pallas_acc(
    tgt_pos: jax.Array,
    tgt_radius: jax.Array,
    src_pos: jax.Array,
    src_gm: jax.Array,
    *,
    tile_targets: int = 512,
    tile_sources: int = 2048,
    precise: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Compute accelerations with the tiled Pallas kernel.

    Args:
      tgt_pos: (T, 2) target positions; T must be a multiple of tile_targets.
      tgt_radius: (T,) target radii.
      src_pos: (S, 2) source positions; S must be a multiple of tile_sources.
      src_gm: (S,) G*mass per source, zero for padding / non-exerting rows.
      interpret: run in interpreter mode (auto-on for non-TPU backends so the
        same code path is testable on the CPU mesh).

    Returns:
      (T, 2) fp32 accelerations.
    """
    t = tgt_pos.shape[0]
    s = src_pos.shape[0]
    tile_targets = min(tile_targets, t)
    tile_sources = min(tile_sources, s)
    if t % tile_targets or tile_targets % TARGET_ALIGN:
        raise ValueError(f"T={t} must be a multiple of tile_targets={tile_targets} (align {TARGET_ALIGN})")
    if s % tile_sources or tile_sources % SOURCE_ALIGN:
        raise ValueError(f"S={s} must be a multiple of tile_sources={tile_sources} (align {SOURCE_ALIGN})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tx = tgt_pos[:, 0:1]  # (T, 1)
    ty = tgt_pos[:, 1:2]
    tr = tgt_radius[:, None]
    sx = src_pos[None, :, 0]  # (1, S)
    sy = src_pos[None, :, 1]
    sgm = src_gm[None, :]

    grid = (t // tile_targets, s // tile_sources)
    tgt_spec = pl.BlockSpec((tile_targets, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    src_spec = pl.BlockSpec((1, tile_sources), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_targets, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_acc_kernel, precise=precise)
    pairs = t * s
    cost = pl.CostEstimate(
        flops=13 * pairs,
        bytes_accessed=(3 * t + 3 * s + 2 * t) * 4,
        transcendentals=pairs,
    )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
    )
    ax, ay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tgt_spec, tgt_spec, tgt_spec, src_spec, src_spec, src_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((t, 1), DTYPE),
            jax.ShapeDtypeStruct((t, 1), DTYPE),
        ],
        cost_estimate=cost,
        compiler_params=compiler_params,
        interpret=interpret,
    )(tx, ty, tr, sx, sy, sgm)
    return jnp.concatenate([ax, ay], axis=1)


@functools.lru_cache(maxsize=None)
def make_differentiable_acc(
    tile_targets: int = 512,
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
