#!/usr/bin/env python
"""Differential op-cost probes for the resident-source kernel.

Strips one piece of math at a time from the v2_rows kernel to locate where
the ~1.5 excess VPU slots/pair (vs the XLA-fused jnp path) are spent.
Results are wrong physics — timing only.
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
from nbody_tpu.types import DTYPE, round_up

SEED = 11037
TILE_T = 512
CHUNK = 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_probe(flavor: str):
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
            if flavor == "skeleton":        # broadcasts + loop only
                return ax + jnp.sum(dx, axis=1, keepdims=True), ay
            r2 = dx * dx + dy * dy + tr
            if flavor == "no_rsqrt":
                f = r2
            else:
                inv = jax.lax.rsqrt(r2)
                if flavor == "no_cube":
                    f = inv
                elif flavor == "no_gm":
                    f = inv * inv * inv
                else:
                    f = gm * (inv * inv * inv)
            if flavor == "one_axis":
                return ax + jnp.sum(dx * f, axis=1, keepdims=True), ay
            if flavor == "no_reduce":
                return ax + (dx * f)[:, 0:1], ay + (dy * f)[:, 0:1]
            ax = ax + jnp.sum(dx * f, axis=1, keepdims=True)
            ay = ay + jnp.sum(dy * f, axis=1, keepdims=True)
            return ax, ay

        zero = jnp.zeros((TILE_T, 1), DTYPE)
        unroll = 16 if flavor == "unroll16" and n_full == 16 else 1
        ax, ay = jax.lax.fori_loop(
            0, n_full, lambda j, c: block(j * CHUNK, CHUNK, c[0], c[1]),
            (zero, zero), unroll=unroll)
        if tail:
            ax, ay = block(n_full * CHUNK, tail, ax, ay)
        ax_ref[:] = jnp.transpose(ax)
        ay_ref[:] = jnp.transpose(ay)

    @jax.jit
    def acc_fn(tgt, src):
        t = tgt.shape[1]
        s = src.shape[1]
        n_full, tail = divmod(s, CHUNK)
        pairs = t * s
        cost = pl.CostEstimate(flops=13 * pairs,
                               bytes_accessed=(3 * t + 3 * s + 2 * t) * 4,
                               transcendentals=pairs)
        ax, ay = pl.pallas_call(
            functools.partial(kernel, n_full=n_full, tail=tail),
            grid=(t // TILE_T,),
            in_specs=[pl.BlockSpec((3, TILE_T), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, s), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, TILE_T), lambda i: (0, i),
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
    src = jnp.asarray(np.stack([host.pos[:s128, 0], host.pos[:s128, 1], gm[:s128]], axis=0))
    pairs = w.n_pad * s128
    log(f"N={n} T={w.n_pad} S128={s128} (slots/pair assumes 3.85e12 fp32 slots/s)")

    for flavor in ["full", "unroll16", "skeleton", "no_rsqrt", "no_cube",
                   "no_gm", "one_axis", "no_reduce"]:
        f = make_probe(flavor)
        try:
            out = f(tgt, src)
            jax.block_until_ready(out)
        except Exception as e:
            log(f"{flavor:>10}: FAILED {type(e).__name__}: {str(e)[:140]}")
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(tgt, src)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        slots = 3.85e12 * best / pairs
        log(f"{flavor:>10}: {best*1e6:9.1f} µs  {pairs/best:.3e} pairs/s  ~{slots:.1f} slots/pair")


if __name__ == "__main__":
    main()
