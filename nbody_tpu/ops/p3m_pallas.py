"""Pallas TPU kernel for the P³M short-range pair correction.

The XLA formulation of the PP stage (ops/p3m_forces._pp_apply) materializes
the 9-neighbor source panels as three (gc, gc, 9·cap) HBM arrays and runs
the pair math through `lax.map` — measured ~135 ms at N=1M on v5e where the
pairwise arithmetic itself is ~25 ms (docs/DESIGN.md §8). This kernel fuses
the neighbor access and the pair math: a 1-D grid over cell ROWS, each
program walking its row's gc cells and evaluating the 3×3 neighborhood as
nine VMEM-resident (cap_t, cap_s) tiles — no intermediate panel ever
touches HBM. Same math as `_pp_apply`'s row body (the taper, the exact
minus tapered-smooth force split, the per-target `+ radius` softening
quirk of ``sim_cpu.c:176``), fp32.

The neighbor rows arrive as three shifted views of the zero-ring-padded
source blocks — the same array passed three times with row index maps
``i → i+di`` (the BlockSpec analogue of the jnp path's shifted slices).
Zero-padded ring slots carry gm = 0 and contribute exactly zero (the
reference's own zero-pad trick, ``sim_cpu.c:133-142``).

Reverse-mode: `pp_blocks` carries a custom VJP whose backward recomputes
the mathematically identical jnp formulation (only the six block arrays are
saved — no O(cells · cap²) residuals), mirroring
``pallas_forces.make_differentiable_acc``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE, SOFTENING_FLOOR


def _pp_kernel(
    scal_ref,  # SMEM (3,): rc, eps2, 1/rc
    tx_ref, ty_ref, tr_ref,        # VMEM (1, gc, cap_t)
    *refs,                         # 9 source refs + 2 out refs
    gc: int,
    cap_t: int,
    cap_s: int,
    precise: bool,
):
    src_refs = refs[:9]   # (x, y, gm) × row offsets 0..2, each (1, gc+2, cap_s)
    ox_ref, oy_ref = refs[9:]
    rc = scal_ref[0]
    eps2 = scal_ref[1]
    inv_rc = scal_ref[2]
    rc2 = rc * rc

    def cell(j, _):
        txc = jnp.transpose(tx_ref[0, pl.ds(j, 1), :])  # (cap_t, 1)
        tyc = jnp.transpose(ty_ref[0, pl.ds(j, 1), :])
        trc = jnp.transpose(tr_ref[0, pl.ds(j, 1), :])
        ax = jnp.zeros((cap_t, cap_s), DTYPE)
        ay = jnp.zeros_like(ax)
        for r in range(3):
            sx_ref, sy_ref, sg_ref = (src_refs[r], src_refs[3 + r],
                                      src_refs[6 + r])
            for dj in range(3):
                sx = sx_ref[0, pl.ds(j + dj, 1), :]  # (1, cap_s)
                sy = sy_ref[0, pl.ds(j + dj, 1), :]
                sg = sg_ref[0, pl.ds(j + dj, 1), :]
                dx = sx - txc                         # (cap_t, cap_s)
                dy = sy - tyc
                d2 = dx * dx + dy * dy
                if precise:
                    r2 = d2 + trc
                    exact3 = 1.0 / (jnp.sqrt(r2) * r2)
                    q2 = d2 + eps2
                    smooth3 = 1.0 / (jnp.sqrt(q2) * q2)
                else:
                    inv = jax.lax.rsqrt(d2 + trc)
                    exact3 = inv * inv * inv
                    invq = jax.lax.rsqrt(d2 + eps2)
                    smooth3 = invq * invq * invq
                u = jnp.minimum(jnp.sqrt(d2 + 1e-12) * inv_rc, 1.0)
                taper = u * u * u * (10.0 + u * (6.0 * u - 15.0))
                w = sg * (exact3 - taper * smooth3)
                w = jnp.where(d2 < rc2, w, 0.0)
                ax = ax + w * dx
                ay = ay + w * dy
        ox_ref[0, pl.ds(j, 1), :] = jnp.transpose(
            jnp.sum(ax, axis=1, keepdims=True))
        oy_ref[0, pl.ds(j, 1), :] = jnp.transpose(
            jnp.sum(ay, axis=1, keepdims=True))
        return 0

    jax.lax.fori_loop(0, gc, cell, 0)


@functools.partial(jax.jit, static_argnames=("precise", "interpret"))
def _pp_blocks_call(tx, ty, tr, sx, sy, sg, rc, eps2, *,
                    precise: bool, interpret: bool | None):
    gc, _, cap_t = tx.shape
    cap_s = sx.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pad = ((1, 1), (1, 1), (0, 0))
    sxp = jnp.pad(sx, pad)   # (gc+2, gc+2, cap_s) zero ring
    syp = jnp.pad(sy, pad)
    sgp = jnp.pad(sg, pad)

    tgt_spec = pl.BlockSpec((1, gc, cap_t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    src_specs = [
        pl.BlockSpec((1, gc + 2, cap_s), lambda i, di=di: (i + di, 0, 0),
                     memory_space=pltpu.VMEM)
        for di in range(3)
    ]
    out_spec = pl.BlockSpec((1, gc, cap_t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _pp_kernel, gc=gc, cap_t=cap_t, cap_s=cap_s, precise=precise)
    pairs = gc * gc * cap_t * 9 * cap_s
    cost = pl.CostEstimate(
        flops=14 * pairs,
        bytes_accessed=4 * (3 * gc * gc * cap_t * 3 + 3 * gc * gc * cap_s),
        transcendentals=3 * pairs,
    )
    scal = jnp.stack([jnp.asarray(rc, DTYPE), jnp.asarray(eps2, DTYPE),
                      1.0 / jnp.asarray(rc, DTYPE)])
    ox, oy = pl.pallas_call(
        kernel,
        grid=(gc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tgt_spec, tgt_spec, tgt_spec,
                  *src_specs, *src_specs, *src_specs],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((gc, gc, cap_t), DTYPE)] * 2,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(scal, tx, ty, tr, sxp, sxp, sxp, syp, syp, syp, sgp, sgp, sgp)
    return jnp.stack([ox, oy], axis=-1).reshape(gc * gc, cap_t, 2)


def _pp_blocks_jnp(tx, ty, tr, sx, sy, sg, rc, eps2, *, precise):
    """Mathematically identical jnp formulation (the _pp_apply row body) —
    the VJP recompute target and the correctness oracle."""
    from .p3m_forces import _taper

    gc = tx.shape[0]
    pad = ((1, 1), (1, 1), (0, 0))

    def neighbors(a):
        ap = jnp.pad(a, pad)
        return jnp.concatenate(
            [ap[i:i + gc, j:j + gc] for i in range(3) for j in range(3)],
            axis=-1)

    nsx, nsy, nsg = neighbors(sx), neighbors(sy), neighbors(sg)
    rc2 = rc * rc

    def row(args):
        tx_r, ty_r, tr_r, sx_r, sy_r, sg_r = args
        dx = sx_r[:, None, :] - tx_r[:, :, None]
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

    return jax.lax.map(
        jax.checkpoint(row), (tx, ty, tr, nsx, nsy, nsg)
    ).reshape(gc * gc, tx.shape[-1], 2)


@functools.lru_cache(maxsize=None)
def _make_pp_blocks(precise: bool, interpret: bool | None):
    @jax.custom_vjp
    def pp(tx, ty, tr, sx, sy, sg, rc, eps2):
        return _pp_blocks_call(tx, ty, tr, sx, sy, sg, rc, eps2,
                               precise=precise, interpret=interpret)

    def fwd(tx, ty, tr, sx, sy, sg, rc, eps2):
        return pp(tx, ty, tr, sx, sy, sg, rc, eps2), (
            tx, ty, tr, sx, sy, sg, rc, eps2)

    def bwd(res, g):
        _, vjp = jax.vjp(
            functools.partial(_pp_blocks_jnp, precise=precise), *res)
        return vjp(g)

    pp.defvjp(fwd, bwd)
    return pp


def pp_blocks(tx, ty, tr, sx, sy, sg, rc, eps2, *,
              precise: bool = False, interpret: bool | None = None):
    """Per-slot PP correction of packed target cell blocks against packed
    source cell blocks: returns (gc², cap_t, 2). Forward = the fused Pallas
    kernel (interpreter off-TPU); backward = adjoint of the identical jnp
    math, recomputed at backward time.
    """
    # + SOFTENING_FLOOR: same NaN guard as the production PP path
    # (p3m_forces._pp_apply); absorbed bitwise for real radii (types.py).
    return _make_pp_blocks(precise, interpret)(
        tx, ty, tr + SOFTENING_FLOOR, sx, sy, sg,
        jnp.asarray(rc, DTYPE), jnp.asarray(eps2, DTYPE))
