#!/usr/bin/env python
"""P-tile variant: each grid step processes P target sub-tiles against
explicitly hoisted source-broadcast arrays (shared across the P tiles).
Tests whether Mosaic materializes (1, chunk) -> (tile, chunk) broadcasts
per consumer (in which case sharing should cut ~1-2 slots/pair)."""

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


def make_ptile(p: int, sub_t: int, chunk: int):
    tile_t = p * sub_t

    def kernel(t_ref, src_ref, ax_ref, ay_ref, *, n_full, tail):
        txs = [jnp.transpose(t_ref[0:1, q * sub_t:(q + 1) * sub_t]) for q in range(p)]
        tys = [jnp.transpose(t_ref[1:2, q * sub_t:(q + 1) * sub_t]) for q in range(p)]
        trs = [jnp.transpose(t_ref[2:3, q * sub_t:(q + 1) * sub_t]) for q in range(p)]

        def block(off, size, carries):
            bsx = jnp.broadcast_to(src_ref[0:1, pl.ds(off, size)], (sub_t, size))
            bsy = jnp.broadcast_to(src_ref[1:2, pl.ds(off, size)], (sub_t, size))
            bgm = jnp.broadcast_to(src_ref[2:3, pl.ds(off, size)], (sub_t, size))
            out = []
            for q in range(p):
                ax, ay = carries[q]
                dx = bsx - txs[q]
                dy = bsy - tys[q]
                r2 = dx * dx + dy * dy + trs[q]
                inv = jax.lax.rsqrt(r2)
                f = bgm * (inv * inv * inv)
                for k in range(size // 128):
                    a, b = k * 128, (k + 1) * 128
                    ax = ax + dx[:, a:b] * f[:, a:b]
                    ay = ay + dy[:, a:b] * f[:, a:b]
                out.append((ax, ay))
            return tuple(out)

        zero = jnp.zeros((sub_t, 128), DTYPE)
        init = tuple((zero, zero) for _ in range(p))
        carries = jax.lax.fori_loop(
            0, n_full, lambda c, car: block(c * chunk, chunk, car), init)
        if tail:
            carries = block(n_full * chunk, tail, carries)
        for q in range(p):
            ax, ay = carries[q]
            sl = slice(q * sub_t, (q + 1) * sub_t)
            ax_ref[0:1, sl] = jnp.transpose(jnp.sum(ax, axis=1, keepdims=True))
            ay_ref[0:1, sl] = jnp.transpose(jnp.sum(ay, axis=1, keepdims=True))

    @jax.jit
    def acc_fn(tgt, src):
        t = tgt.shape[1]
        s = src.shape[1]
        n_full, tail = divmod(s, chunk)
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
            _ = np.asarray(jax.tree.leaves(out)[0])[..., 0]
            best = min(best, (time.perf_counter() - t0) / 20)
        return best

    ref = np.asarray(jnp_acc(pos))
    scale = np.abs(ref).max()
    best = time_it(jnp_acc, pos)
    log(f"{'jnp(exact)':>22}: {best*1e6:9.1f} µs  {real_pairs/best:.3e} pairs/s")

    for p, sub_t, chunk in [
        (1, 1024, 2048),
        (2, 512, 2048),
        (4, 256, 2048),
        (4, 512, 1024),
        (8, 128, 2048),
        (2, 1024, 1024),
        (4, 256, 4096),
    ]:
        name = f"p{p}x{sub_t}c{chunk}"
        f = make_ptile(p, sub_t, chunk)
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
