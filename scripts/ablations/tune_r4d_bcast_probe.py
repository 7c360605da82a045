#!/usr/bin/env python
"""Micro-probe: which (1,128)->(tile_t,128) source-slice materializations
does this Mosaic version compile, and what do they cost? (Round-4 layout
bug hunt: vector.broadcast of a sublane-replicated slice with a nonzero
lane offset is 'Invalid input layout'.)

Run: python -u scripts/ablations/tune_r4d_bcast_probe.py   (on TPU)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, S = 512, 4096
REPS = 2048  # repeat the S sweep in-kernel so timing dominates launch


def kernel(tgt_ref, src_ref, out_ref, *, variant):
    shape = (T, 128)
    txb = jnp.broadcast_to(jnp.transpose(tgt_ref[0:1, :]), shape)
    tyb = jnp.broadcast_to(jnp.transpose(tgt_ref[1:2, :]), shape)
    trb = jnp.broadcast_to(jnp.transpose(tgt_ref[2:3, :]), shape)
    ones = jnp.ones((T, 1), jnp.float32)

    def body(r, car):
        ax, ay = car
        for k in range(S // 128):
            if variant == "arrslice":  # slice of a loaded (1, S) array
                sxa, sya, gma = (src_ref[0:1, :], src_ref[1:2, :],
                                 src_ref[2:3, :])
                sxk, syk, gmk = (sxa[:, k*128:(k+1)*128],
                                 sya[:, k*128:(k+1)*128],
                                 gma[:, k*128:(k+1)*128])
            else:  # fresh (1, 128) ref load per slice
                sxk = src_ref[0:1, k*128:(k+1)*128]
                syk = src_ref[1:2, k*128:(k+1)*128]
                gmk = src_ref[2:3, k*128:(k+1)*128]
            if variant == "onesmul":
                sxk, syk, gmk = ones * sxk, ones * syk, ones * gmk
            elif variant == "bcast":
                sxk = jnp.broadcast_to(sxk, (T, 128))
                syk = jnp.broadcast_to(syk, (T, 128))
                gmk = jnp.broadcast_to(gmk, (T, 128))
            # "mixed"/"arrslice": rely on implicit binary-op broadcasting
            dx = sxk - txb
            dy = syk - tyb
            r2 = dx * dx + dy * dy + trb
            inv = jax.lax.rsqrt(r2)
            f = gmk * (inv * inv * inv)
            ax = ax + dx * f
            ay = ay + dy * f
        return ax, ay

    zero = jnp.zeros((T, 128), jnp.float32)
    ax, ay = jax.lax.fori_loop(0, REPS, body, (zero, zero))
    out_ref[0:1, :] = jnp.transpose(jnp.sum(ax, axis=1, keepdims=True))
    out_ref[1:2, :] = jnp.transpose(jnp.sum(ay, axis=1, keepdims=True))


@functools.partial(jax.jit, static_argnames=("variant",))
def run(tgt, src, *, variant):
    return pl.pallas_call(
        functools.partial(kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((2, T), jnp.float32),
    )(tgt, src)


rng = np.random.RandomState(0)
tgt = jnp.asarray(rng.randn(3, T), jnp.float32)
src = jnp.asarray(rng.randn(3, S), jnp.float32)

ref = None
for variant in ("mixed", "bcast", "onesmul", "arrslice"):
    try:
        out = jax.block_until_ready(run(tgt, src, variant=variant))
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(tgt, src, variant=variant))
        el = time.perf_counter() - t0
        pairs = T * S * REPS
        if ref is None:
            ref = np.asarray(out)
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        print(f"{variant:9s} {el*1e3:8.1f} ms  {pairs/el/1e11:.2f}e11 pairs/s"
              f"  (vs first: {err:.1e})", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:110]
        print(f"{variant:9s} FAILED {type(e).__name__}: {msg}", flush=True)
