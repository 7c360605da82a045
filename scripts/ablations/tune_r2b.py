#!/usr/bin/env python
"""Round-2 micro-variants of the resident-source kernel (v2 of tune_r2.py).

All at tile_t x chunk = 512 x 2048 unless stated, N=65536, exact sources
(padded to 128 only).
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


def _body_math(tx, ty, tr, sx, sy, gm, precise=False):
    dx = sx - tx
    dy = sy - ty
    r2 = dx * dx + dy * dy + tr
    if precise:
        f = gm / (jnp.sqrt(r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        f = gm * (inv * inv * inv)
    return dx, dy, f


# ---- variant kernels -------------------------------------------------------
def make_v2(flavor: str, tile_t: int, chunk: int, unroll=1):
    """Returns acc_fn(tgt_pos, tgt_radius, src(3,S)) -> (T,2)."""

    def kernel_cols(tx_ref, ty_ref, tr_ref, src_ref, ax_ref, ay_ref,
                    *, n_full, tail):
        tx, ty, tr = tx_ref[:], ty_ref[:], tr_ref[:]

        def block(off, size, ax, ay):
            sx = src_ref[0:1, pl.ds(off, size)]
            sy = src_ref[1:2, pl.ds(off, size)]
            gm = src_ref[2:3, pl.ds(off, size)]
            dx, dy, f = _body_math(tx, ty, tr, sx, sy, gm)
            if flavor == "partial":
                k = size // 128
                ax = ax + jnp.sum((dx * f).reshape(tile_t, k, 128), axis=1)
                ay = ay + jnp.sum((dy * f).reshape(tile_t, k, 128), axis=1)
            else:
                ax = ax + jnp.sum(dx * f, axis=1, keepdims=True)
                ay = ay + jnp.sum(dy * f, axis=1, keepdims=True)
            return ax, ay

        shape = (tile_t, 128) if flavor == "partial" else (tile_t, 1)
        zero = jnp.zeros(shape, DTYPE)
        if flavor == "static":
            ax, ay = zero, zero
            for j in range(n_full):
                ax, ay = block(j * chunk, chunk, ax, ay)
        else:
            ax, ay = jax.lax.fori_loop(
                0, n_full,
                lambda j, c: block(j * chunk, chunk, c[0], c[1]),
                (zero, zero), unroll=unroll)
        if tail:
            ax, ay = block(n_full * chunk, tail, ax, ay)
        if flavor == "partial":
            ax = jnp.sum(ax, axis=1, keepdims=True)
            ay = jnp.sum(ay, axis=1, keepdims=True)
        ax_ref[:] = ax
        ay_ref[:] = ay

    def kernel_rows(t_ref, src_ref, ax_ref, ay_ref, *, n_full, tail):
        # targets arrive as a (3, tile_t) row block; transpose to columns
        tx = jnp.transpose(t_ref[0:1, :])
        ty = jnp.transpose(t_ref[1:2, :])
        tr = jnp.transpose(t_ref[2:3, :])

        def block(off, size, ax, ay):
            sx = src_ref[0:1, pl.ds(off, size)]
            sy = src_ref[1:2, pl.ds(off, size)]
            gm = src_ref[2:3, pl.ds(off, size)]
            dx, dy, f = _body_math(tx, ty, tr, sx, sy, gm)
            ax = ax + jnp.sum(dx * f, axis=1, keepdims=True)
            ay = ay + jnp.sum(dy * f, axis=1, keepdims=True)
            return ax, ay

        zero = jnp.zeros((tile_t, 1), DTYPE)
        ax, ay = jax.lax.fori_loop(
            0, n_full, lambda j, c: block(j * chunk, chunk, c[0], c[1]),
            (zero, zero), unroll=unroll)
        if tail:
            ax, ay = block(n_full * chunk, tail, ax, ay)
        ax_ref[:] = jnp.transpose(ax)
        ay_ref[:] = jnp.transpose(ay)

    @functools.partial(jax.jit, static_argnames=())
    def acc_fn(tgt_pos, tgt_radius, src):
        t = tgt_pos.shape[0]
        s = src.shape[1]
        n_full, tail = divmod(s, chunk)
        pairs = t * s
        cost = pl.CostEstimate(flops=13 * pairs,
                               bytes_accessed=(3 * t + 3 * s + 2 * t) * 4,
                               transcendentals=pairs)
        src_spec = pl.BlockSpec((3, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if flavor == "rows":
            tgt = jnp.stack([tgt_pos[:, 0], tgt_pos[:, 1], tgt_radius], axis=0)
            ax, ay = pl.pallas_call(
                functools.partial(kernel_rows, n_full=n_full, tail=tail),
                grid=(t // tile_t,),
                in_specs=[pl.BlockSpec((3, tile_t), lambda i: (0, i),
                                       memory_space=pltpu.VMEM), src_spec],
                out_specs=[pl.BlockSpec((1, tile_t), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((1, t), DTYPE)] * 2,
                cost_estimate=cost,
                compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            )(tgt, src)
            return jnp.stack([ax[0], ay[0]], axis=1)
        tgt_spec = pl.BlockSpec((tile_t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tile_t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ax, ay = pl.pallas_call(
            functools.partial(kernel_cols, n_full=n_full, tail=tail),
            grid=(t // tile_t,),
            in_specs=[tgt_spec, tgt_spec, tgt_spec, src_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((t, 1), DTYPE)] * 2,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(tgt_pos[:, 0:1], tgt_pos[:, 1:2], tgt_radius[:, None], src)
        return jnp.concatenate([ax, ay], axis=1)

    return acc_fn


def time_substeps(step_fn, state0, iters=50, repeats=3):
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda _, s: step_fn(s), state)

    jax.block_until_ready(run(state0))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state0))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    scene = nb.make_galaxies(n, 2, seed=SEED)
    w = nb.create_world(scene)
    s128 = round_up(w.mass_len, 128)
    pos, vel = w.state.pos, w.state.vel
    radius, valid, gm = w.state.radius, w.valid, w.gm
    dt = jnp.float32(0.001)
    real_pairs = w.total_len * w.mass_len
    log(f"N={n} T_pad={w.n_pad} mass_len={w.mass_len} S128={s128}")

    def bench(name, acc_fn, check_against=None):
        def step(state):
            p, v = state
            a = acc_fn(p) * valid
            v = v + dt * a
            return (p + dt * v, v)
        try:
            us = time_substeps(step, (pos, vel))
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return None
        rate = real_pairs / (us / 1e6)
        log(f"{name:>28}: {us:9.1f} µs/substep  {rate:.3e} pairs/s")
        if check_against is not None:
            got = np.asarray(acc_fn(pos))
            ref = np.asarray(check_against(pos))
            err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-6))
            log(f"{'':>28}  max rel err vs jnp: {err:.2e}")
        return rate

    def jnp_acc(p):
        return forces.direct_sum_acc(p, radius, p[:w.mass_len], gm[:w.mass_len],
                                     chunk=512, precise=False)

    bench("jnp(exact)", jnp_acc)

    def with_src(f):
        def g(p):
            s = jnp.stack([p[:s128, 0], p[:s128, 1], gm[:s128]], axis=0)
            return f(p, radius, s)
        return g

    bench("v2_base(512x2048)", with_src(make_v2("base", 512, 2048)), jnp_acc)
    bench("v2_rows(512x2048)", with_src(make_v2("rows", 512, 2048)), jnp_acc)
    bench("v2_partial(512x2048)", with_src(make_v2("partial", 512, 2048)))
    bench("v2_unroll2(512x2048)", with_src(make_v2("base", 512, 2048, unroll=2)))
    bench("v2_static(512x2048)", with_src(make_v2("static", 512, 2048)))
    bench("v2_rows(512x1024)u2", with_src(make_v2("rows", 512, 1024, unroll=2)))
    bench("v2_rows(1024x1024)", with_src(make_v2("rows", 1024, 1024)))
    bench("v2_rows(256x2048)", with_src(make_v2("rows", 256, 2048)))


if __name__ == "__main__":
    main()
