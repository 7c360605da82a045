#!/usr/bin/env python
"""Newton's-3rd-law kernel prototype (force only, resident sources).

Massive x massive tile pairs (I, J>I) are computed ONCE: the block's
dx/dy/d^2 feed both the forward force on targets I (softening: target radius,
source gm) and the reverse force on sources J (softening: source radius,
target gm) — exact reference semantics both ways, ~halving the pair math for
the massive prefix. Sequential grid over target tiles; reverse contributions
accumulate in a (1, S) VMEM scratch row pair, added at each tile's finalize.

Coverage per target tile i (tile width W):
  massive tile (i < M_full):  diag fwd [iW,(i+1)W) + dual [(i+1)W, M_full*W)
                              + fwd tail [M_full*W, S) + reverse slice from
                              earlier steps
  other tiles:                fwd [0, M_full*W) + fwd tail [M_full*W, S)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu import forces
from nbody_tpu.types import DTYPE, round_up

SEED = 11037


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_newton(tile_t: int, mass_len: int, s: int, fchunk: int = 2048):
    m_full = mass_len // tile_t          # full massive target tiles
    tpc = fchunk // tile_t               # target tiles per source chunk
    m_ch = (m_full * tile_t) // fchunk   # full massive source chunks
    tail_lo = m_ch * fchunk              # ragged massive + padding from here
    tail_n_full, tail_rem = divmod(s - tail_lo, fchunk)

    def kernel(tgt_ref, src_ref, ax_ref, ay_ref, rvx, rvy):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            rvx[...] = jnp.zeros_like(rvx)
            rvy[...] = jnp.zeros_like(rvy)

        tx = jnp.transpose(tgt_ref[0:1, :])
        ty = jnp.transpose(tgt_ref[1:2, :])
        tr = jnp.transpose(tgt_ref[2:3, :])
        tgm = jnp.transpose(tgt_ref[3:4, :])

        def fwd_block(off, size, ax, ay):
            sx = src_ref[0:1, pl.ds(off, size)]
            sy = src_ref[1:2, pl.ds(off, size)]
            gm = src_ref[2:3, pl.ds(off, size)]
            dx = sx - tx
            dy = sy - ty
            r2 = dx * dx + dy * dy + tr
            inv = jax.lax.rsqrt(r2)
            f = gm * (inv * inv * inv)
            for k in range(size // 128):
                a, b = k * 128, (k + 1) * 128
                ax = ax + dx[:, a:b] * f[:, a:b]
                ay = ay + dy[:, a:b] * f[:, a:b]
            return ax, ay

        def dual_block(ch, carry):
            # chunk-wide (fchunk) dual block: forward for this target tile,
            # reverse scattered into the chunk's tpc per-tile scratch planes
            ax, ay = carry
            off = ch * fchunk
            sx = src_ref[0:1, pl.ds(off, fchunk)]
            sy = src_ref[1:2, pl.ds(off, fchunk)]
            gm = src_ref[2:3, pl.ds(off, fchunk)]
            sr = src_ref[3:4, pl.ds(off, fchunk)]
            dx = sx - tx
            dy = sy - ty
            d2 = dx * dx + dy * dy
            r2f = d2 + tr
            invf = jax.lax.rsqrt(r2f)
            ff = gm * (invf * invf * invf)
            for k in range(fchunk // 128):
                a, b = k * 128, (k + 1) * 128
                ax = ax + dx[:, a:b] * ff[:, a:b]
                ay = ay + dy[:, a:b] * ff[:, a:b]
            # reverse: force ON sources (softening: source radius; gm: target)
            r2r = d2 + sr
            invr = jax.lax.rsqrt(r2r)
            fr = tgm * (invr * invr * invr)
            pxs = jnp.sum(dx * fr, axis=0, keepdims=True)  # (1, fchunk)
            pys = jnp.sum(dy * fr, axis=0, keepdims=True)
            for q in range(tpc):
                jt = ch * tpc + q
                a, b = q * tile_t, (q + 1) * tile_t
                rvx[jt, 0:1, :] = rvx[jt, 0:1, :] - pxs[:, a:b]
                rvy[jt, 0:1, :] = rvy[jt, 0:1, :] - pys[:, a:b]
            return ax, ay

        zero = jnp.zeros((tile_t, 128), DTYPE)
        massive = i < m_full
        home = i // tpc  # source chunk containing this target tile
        # forward chunk-blocks: massive -> home chunk only (same-chunk pairs
        # run both directions forward); others -> all massive chunks
        lo_c = jnp.where(massive, home, 0)
        hi_c = jnp.where(massive, home + 1, m_ch)
        ax, ay = jax.lax.fori_loop(
            lo_c, hi_c,
            lambda c, car: fwd_block(c * fchunk, fchunk, car[0], car[1]),
            (zero, zero))
        # dual chunk-blocks (massive tiles only; empty range otherwise)
        ax, ay = jax.lax.fori_loop(
            jnp.where(massive, home + 1, m_ch), m_ch, dual_block, (ax, ay))
        # common forward tail [tail_lo, S)
        ax, ay = jax.lax.fori_loop(
            0, tail_n_full,
            lambda c, car: fwd_block(tail_lo + c * fchunk, fchunk, car[0], car[1]),
            (ax, ay))
        if tail_rem:
            ax, ay = fwd_block(tail_lo + tail_n_full * fchunk, tail_rem, ax, ay)

        arow = jnp.transpose(jnp.sum(ax, axis=1, keepdims=True))
        brow = jnp.transpose(jnp.sum(ay, axis=1, keepdims=True))
        # add reverse contributions (zero-masked for non-massive tiles)
        it = jnp.minimum(i, max(m_full - 1, 0))
        mask = jnp.where(massive, 1.0, 0.0).astype(DTYPE)
        arow = arow + mask * rvx[it, 0:1, :]
        brow = brow + mask * rvy[it, 0:1, :]
        ax_ref[:] = arow
        ay_ref[:] = brow

    @jax.jit
    def acc_fn(tgt, src):
        t = tgt.shape[1]
        pairs = t * s
        cost = pl.CostEstimate(flops=13 * pairs,
                               bytes_accessed=(4 * t + 4 * s + 2 * t) * 4,
                               transcendentals=pairs)
        ax, ay = pl.pallas_call(
            kernel,
            grid=(t // tile_t,),
            in_specs=[pl.BlockSpec((4, tile_t), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((4, s), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, tile_t), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((1, t), DTYPE)] * 2,
            scratch_shapes=[pltpu.VMEM((max(m_full, 1), 1, tile_t), DTYPE),
                            pltpu.VMEM((max(m_full, 1), 1, tile_t), DTYPE)],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(tgt, src)
        return ax, ay

    return acc_fn


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    scene = nb.make_galaxies(n, 2, seed=SEED)
    w = nb.create_world(scene)
    s128 = round_up(w.mass_len, 128)
    host = jax.tree.map(np.asarray, w.state)
    gm = np.asarray(w.gm)
    tgt = jnp.asarray(np.stack([host.pos[:, 0], host.pos[:, 1], host.radius,
                                gm], axis=0))
    src = jnp.asarray(np.stack(
        [host.pos[:s128, 0], host.pos[:s128, 1], gm[:s128],
         host.radius[:s128]], axis=0))
    real_pairs = w.total_len * w.mass_len
    pos, radius = w.state.pos, w.state.radius
    log(f"N={n} T={w.n_pad} mass_len={w.mass_len} S128={s128}")

    @jax.jit
    def jnp_acc(p):
        return forces.direct_sum_acc(p, radius, p[:w.mass_len], gm[:w.mass_len],
                                     chunk=512, precise=False)

    def time_it(f, *args):
        jax.block_until_ready(f(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    ref = np.asarray(jnp_acc(pos))
    scale = np.abs(ref).max()
    best = time_it(jnp_acc, pos)
    log(f"{'jnp(exact)':>22}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s")

    for tile_t in (512, 1024, 256):
        name = f"newton({tile_t})"
        f = make_newton(tile_t, w.mass_len, s128)
        try:
            out = f(tgt, src)
            jax.block_until_ready(out)
        except Exception as e:
            log(f"{name:>22}: FAILED {type(e).__name__}: {str(e)[:130]}")
            continue
        got = np.stack([np.asarray(out[0])[0], np.asarray(out[1])[0]], axis=1)
        err = np.max(np.abs(got - ref)) / scale
        best = time_it(f, tgt, src)
        log(f"{name:>22}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s  (err {err:.1e})")


if __name__ == "__main__":
    main()
