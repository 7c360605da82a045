#!/usr/bin/env python
"""K3: source-stationary kernel — grid over source chunks, target loop inside.

Source broadcasts to (tile_t, chunk) are hoisted out of the target loop
(amortized over n_i target tiles instead of re-materialized per grid step as
in the target-stationary v2). Accumulator output (2, T) is revisited across
sequential grid steps (flash-attention-style).

Exact sources: S padded to `chunk` only (chunk as small as 128).
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


def make_k3(tile_t: int, chunk: int, manual_reduce: bool, precise=False):
    def kernel(tgt_ref, src_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        n_i = tgt_ref.shape[1] // tile_t
        # hoisted: materialize source-row broadcasts ONCE per grid step
        bsx = jnp.broadcast_to(src_ref[0:1, :], (tile_t, chunk))
        bsy = jnp.broadcast_to(src_ref[1:2, :], (tile_t, chunk))
        bgm = jnp.broadcast_to(src_ref[2:3, :], (tile_t, chunk))

        def i_body(i, _):
            sl = pl.ds(i * tile_t, tile_t)
            tx = jnp.transpose(tgt_ref[0:1, sl])  # (tile_t, 1)
            ty = jnp.transpose(tgt_ref[1:2, sl])
            tr = jnp.transpose(tgt_ref[2:3, sl])
            dx = bsx - tx
            dy = bsy - ty
            r2 = dx * dx + dy * dy + tr
            if precise:
                f = bgm / (jnp.sqrt(r2) * r2)
            else:
                inv = jax.lax.rsqrt(r2)
                f = bgm * (inv * inv * inv)
            px = dx * f
            py = dy * f
            if manual_reduce:
                k = chunk // 128
                if k > 1:
                    px = jnp.sum(px.reshape(tile_t, k, 128), axis=1)
                    py = jnp.sum(py.reshape(tile_t, k, 128), axis=1)
                ax = jnp.sum(px, axis=1, keepdims=True)
                ay = jnp.sum(py, axis=1, keepdims=True)
            else:
                ax = jnp.sum(px, axis=1, keepdims=True)
                ay = jnp.sum(py, axis=1, keepdims=True)
            acc_ref[0:1, sl] += jnp.transpose(ax)
            acc_ref[1:2, sl] += jnp.transpose(ay)
            return 0

        jax.lax.fori_loop(0, n_i, i_body, 0)

    @jax.jit
    def acc_fn(tgt, src):
        t = tgt.shape[1]
        s = src.shape[1]
        assert s % chunk == 0
        pairs = t * s
        cost = pl.CostEstimate(flops=13 * pairs,
                               bytes_accessed=(3 * t + 3 * s + 2 * t) * 4,
                               transcendentals=pairs)
        acc = pl.pallas_call(
            kernel,
            grid=(s // chunk,),
            in_specs=[pl.BlockSpec((3, t), lambda j: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, chunk), lambda j: (0, j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, t), lambda j: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, t), DTYPE),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(tgt, src)
        return acc

    return acc_fn


def main():
    n = 65536
    scene = nb.make_galaxies(n, 2, seed=SEED)
    w = nb.create_world(scene)
    host = jax.tree.map(np.asarray, w.state)
    gm = np.asarray(w.gm)
    tgt = jnp.asarray(np.stack([host.pos[:, 0], host.pos[:, 1], host.radius], axis=0))
    real_pairs = w.total_len * w.mass_len
    log(f"N={n} T={w.n_pad} mass_len={w.mass_len}")

    # jnp control
    pos, radius = w.state.pos, w.state.radius

    @jax.jit
    def jnp_acc(p):
        return forces.direct_sum_acc(p, radius, p[:w.mass_len], gm[:w.mass_len],
                                     chunk=512, precise=False)

    def time_it(f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    ref = np.asarray(jnp_acc(pos))
    best = time_it(jnp_acc, pos)
    log(f"{'jnp(exact)':>24}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s")

    for tile_t, chunk, manual in [
        (512, 128, False), (512, 256, False), (512, 512, False),
        (512, 512, True), (512, 1024, False), (512, 2048, False),
        (1024, 512, False), (1024, 1024, False), (2048, 512, False),
        (256, 512, False),
    ]:
        s_pad = round_up(w.mass_len, chunk)
        src = jnp.asarray(np.stack(
            [host.pos[:s_pad, 0], host.pos[:s_pad, 1], gm[:s_pad]], axis=0))
        f = make_k3(tile_t, chunk, manual)
        name = f"k3({tile_t}x{chunk}{'m' if manual else ''})"
        try:
            out = f(tgt, src)
            jax.block_until_ready(out)
        except Exception as e:
            log(f"{name:>24}: FAILED {type(e).__name__}: {str(e)[:140]}")
            continue
        got = np.stack([np.asarray(out)[0], np.asarray(out)[1]], axis=1)
        scale = np.abs(ref).max()
        err = np.max(np.abs(got - ref)) / scale
        best = time_it(f, tgt, src)
        log(f"{name:>24}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s  "
            f"(maxerr/scale {err:.1e}, dead {s_pad - w.mass_len})")


if __name__ == "__main__":
    main()
