#!/usr/bin/env python
"""Reduction-strategy variants on the v2_rows kernel (grid over target tiles,
sources VMEM-resident, fori over source chunks, exact tail).

  control       per-chunk jnp.sum -> (tile_t, 1) carry
  partial_jnp   (tile_t, 128) partial carry; per-chunk reshape+sum(axis=1);
                single lane-reduce after the loop
  fma_kloop     (tile_t, 128) carry; static k-loop of 128-wide slice FMAs;
                no px/py materialization
  f_assoc       control with f = (gm*inv)*(inv*inv)
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


def make_v3(flavor: str, tile_t: int, chunk: int):
    partial = flavor in ("partial_jnp", "fma_kloop")

    def kernel(t_ref, src_ref, ax_ref, ay_ref, *, n_full, tail):
        tx = jnp.transpose(t_ref[0:1, :])
        ty = jnp.transpose(t_ref[1:2, :])
        tr = jnp.transpose(t_ref[2:3, :])

        def block(off, size, ax, ay):
            sx = src_ref[0:1, pl.ds(off, size)]
            sy = src_ref[1:2, pl.ds(off, size)]
            gm = src_ref[2:3, pl.ds(off, size)]
            dx = sx - tx
            dy = sy - ty
            r2 = dx * dx + dy * dy + tr
            inv = jax.lax.rsqrt(r2)
            if flavor == "f_assoc":
                f = (gm * inv) * (inv * inv)
            else:
                f = gm * (inv * inv * inv)
            if flavor == "partial_jnp":
                k = size // 128
                px = (dx * f).reshape(tile_t, k, 128)
                py = (dy * f).reshape(tile_t, k, 128)
                ax = ax + jnp.sum(px, axis=1)
                ay = ay + jnp.sum(py, axis=1)
            elif flavor == "fma_kloop":
                for k in range(size // 128):
                    a, b = k * 128, (k + 1) * 128
                    ax = ax + dx[:, a:b] * f[:, a:b]
                    ay = ay + dy[:, a:b] * f[:, a:b]
            else:
                ax = ax + jnp.sum(dx * f, axis=1, keepdims=True)
                ay = ay + jnp.sum(dy * f, axis=1, keepdims=True)
            return ax, ay

        shape = (tile_t, 128) if partial else (tile_t, 1)
        zero = jnp.zeros(shape, DTYPE)
        ax, ay = jax.lax.fori_loop(
            0, n_full, lambda j, c: block(j * chunk, chunk, c[0], c[1]),
            (zero, zero))
        if tail:
            ax, ay = block(n_full * chunk, tail, ax, ay)
        if partial:
            ax = jnp.sum(ax, axis=1, keepdims=True)
            ay = jnp.sum(ay, axis=1, keepdims=True)
        ax_ref[:] = jnp.transpose(ax)
        ay_ref[:] = jnp.transpose(ay)

    @jax.jit
    def acc_fn(tgt, src):
        t = tgt.shape[1]
        s = src.shape[1]
        n_full, tail = divmod(s, chunk)
        if tail and tail % 128:
            raise ValueError(s)
        pairs = t * s
        cost = pl.CostEstimate(flops=13 * pairs,
                               bytes_accessed=(3 * t + 3 * s + 2 * t) * 4,
                               transcendentals=pairs)
        ax, ay = pl.pallas_call(
            functools.partial(kernel, n_full=n_full, tail=tail),
            grid=(t // tile_t,),
            in_specs=[pl.BlockSpec((3, tile_t), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, s), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, tile_t), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((1, t), DTYPE)] * 2,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(tgt, src)
        return ax, ay

    return acc_fn


def main():
    n = 65536
    scene = nb.make_galaxies(n, 2, seed=SEED)
    w = nb.create_world(scene)
    s128 = round_up(w.mass_len, 128)
    host = jax.tree.map(np.asarray, w.state)
    gm = np.asarray(w.gm)
    tgt = jnp.asarray(np.stack([host.pos[:, 0], host.pos[:, 1], host.radius], axis=0))
    src = jnp.asarray(np.stack(
        [host.pos[:s128, 0], host.pos[:s128, 1], gm[:s128]], axis=0))
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
    log(f"{'jnp(exact)':>26}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s")

    for flavor, tile_t, chunk in [
        ("fma_kloop", 1024, 2048),
        ("fma_kloop", 2048, 2048),
        ("fma_kloop", 2048, 1024),
        ("fma_kloop", 4096, 1024),
        ("fma_kloop", 1024, 4096),
        ("control", 1024, 2048),
        ("f_assoc", 1024, 2048),
    ]:
        name = f"{flavor}({tile_t}x{chunk})"
        f = make_v3(flavor, tile_t, chunk)
        try:
            out = f(tgt, src)
            jax.block_until_ready(out)
        except Exception as e:
            log(f"{name:>26}: FAILED {type(e).__name__}: {str(e)[:130]}")
            continue
        got = np.stack([np.asarray(out[0])[0], np.asarray(out[1])[0]], axis=1)
        err = np.max(np.abs(got - ref)) / scale
        best = time_it(f, tgt, src)
        log(f"{name:>26}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s  (err {err:.1e})")


if __name__ == "__main__":
    main()
