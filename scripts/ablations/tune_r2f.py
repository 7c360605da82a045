#!/usr/bin/env python
"""VPU op-cost probes, tunnel-proof: marginal time between two loop counts,
with a value fetch to force completion. Self-chaining exprs, no DCE."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TT, CC = 256, 2048
LO, HI = 4096, 12288


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_probe(expr, loops):
    def kernel(x_ref, y_ref, o_ref):
        y = y_ref[:]
        acc = x_ref[:]
        acc = jax.lax.fori_loop(0, loops, lambda i, a: expr(a, y), acc)
        o_ref[:] = acc

    @jax.jit
    def f(x, y):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TT, CC), jnp.float32),
        )(x, y)

    return f


def timed(f, x, y, reps=4):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x, y)
        _ = np.asarray(out)[0, 0]  # force real completion through the tunnel
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), (TT, CC), jnp.float32, 1.0, 2.0)
    probes = {
        "add": lambda a, b: a + b,
        "mul": lambda a, b: a * 1.0000001,
        "fma_pat": lambda a, b: a * 0.9999 + 1e-4,
        "rsqrt": lambda a, b: jax.lax.rsqrt(a) + 0.5,
        "sqrt": lambda a, b: jnp.sqrt(a) + 0.1,
        "recip_apx": lambda a, b: pl.reciprocal(a, approx=True) + 0.5,
        "rsqrt3": lambda a, b: (lambda i: i * i * i)(jax.lax.rsqrt(a)) + 0.5,
        "full_f": lambda a, b: (lambda i: b * (i * i * i))(jax.lax.rsqrt(a)) + 0.5,
        "sq_chain": lambda a, b: (a * a + b * b + 0.5) * 0.3,
    }
    elems = TT * CC * (HI - LO)
    for name, expr in probes.items():
        try:
            y = jax.random.uniform(jax.random.PRNGKey(1), (TT, CC), jnp.float32,
                                   1e-7, 2e-7 if name == "add" else 2.0)
            flo, fhi = make_probe(expr, LO), make_probe(expr, HI)
            t = timed(fhi, x, y) - timed(flo, x, y)
        except Exception as e:
            log(f"{name:>10}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        log(f"{name:>10}: {t*1e3:8.2f} ms marginal  {3.85e12*t/elems:5.2f} slots/elem")


if __name__ == "__main__":
    main()
