#!/usr/bin/env python
"""Round-3 P³M spatial-bookkeeping measurements (results in DESIGN.md §8).

Methodology note: the remote-TPU tunnel adds ~30-40 ms RTT per host call
and `block_until_ready` returns lazily for large outputs, so every number
here comes from an IN-JIT K-loop with a carried scalar dependency
(`s + out.sum()`), timed to-value, RTT-subtracted, divided by K.

Findings at N=1M, grid=512, gc=128, cap=96 (v5e):
  * pair compute (XLA fused map):    ~17 ms
  * fused Pallas PP kernel (ablation, ops/p3m_pallas.py): ~30 ms (loses —
    broadcast-materialization tax + per-cell dynamic-slice loop)
  * block pack, 6 separate panel gathers:        ~189 ms  (round-2 code)
  * block pack, stacked single gather per side:   fixes -> 243.7 - 185.4
    full-substep delta
  * N-row scatter pack form:                     2.2x slower than gather
  * unpack via permutation scatter:               ~50 ms
  * unpack via lax.sort with payload channels:    ~12 ms
  * CIC scatter 16.6 ms (combined-corner 17.3, sort+cumsum 55.5 — keep);
    CIC gather 48.1 ms (gather-throughput bound); FFT solve 3.4 ms
  * primitives: 1M stable argsort 4.0 ms, 2-key lexsort 6 ms/0.5M,
    1M random gather 10.5 ms, 1.57M monotonic gather 14.6 ms,
    1M permutation scatter 9.5 ms (but 2-D block scatters are far worse)

Run: python scripts/ablations/tune_r3b_p3m_bookkeeping.py  (takes ~5 min on TPU)
"""
import sys, time, functools
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import nbody_tpu as nb
from nbody_tpu.ops import p3m_forces as P
from nbody_tpu.ops.pm_forces import _bounds, _box, _cic_scatter, _solve, _cic_gather

N = 1_000_000
GRID, RC_CELLS, CAP = 512, 4, 96
K = 10


def kloop(piece, arg):
    @jax.jit
    def run(x):
        def body(i, s):
            return s + piece(x + 1e-18 * s).sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(run(arg))
    t0 = time.perf_counter()
    float(run(arg))
    return (time.perf_counter() - t0) * 1e3 / K


def main():
    scene = nb.make_galaxies(N, 2, seed=11037)
    w = nb.create_world(scene)
    pos = w.state.pos
    rad = w.state.radius
    ml = w.mass_len
    gm = w.gm[:ml]
    gc = GRID // RC_CELLS
    lo, h = jax.jit(lambda p: _box(*_bounds(p, p[:ml], gm, None), GRID))(pos)
    eps2 = jnp.float32(4.0)

    def mesh(p):
        rho = _cic_scatter(p[:ml], gm, lo, 1.0 / h, GRID)
        a = _solve(rho, h, eps2, GRID, rc=RC_CELLS * h)
        return _cic_gather(a, p, lo, 1.0 / h, GRID)

    def pp(p):
        cell = (GRID * h) / gc
        return P._pp_correction(p, rad, p[:ml], gm, lo, 1.0 / cell, gc,
                                CAP, RC_CELLS * h, eps2, False)

    print(f"mesh stage: {kloop(mesh, pos):.1f} ms")
    print(f"pp stage:   {kloop(pp, pos):.1f} ms")
    print(f"full p3m:   {kloop(lambda p: P.p3m_acc(p, rad, p[:ml], gm, 2.0), pos):.1f} ms")


if __name__ == "__main__":
    main()
