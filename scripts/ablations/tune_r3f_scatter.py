#!/usr/bin/env python
"""Round-3 CIC scatter experiment: sort + segment-sum vs 4 scatter-adds.

The scatter is the last mesh-stage cost that has not moved: 17 ms at
N=1M/G=512, and the dominant term at the one-chip pm ceiling (N=64M).
Prior negatives (tune_r2*, tune_r3d): combined-corner single scatter =
noise; (N,4)-row scatter into a (G²,4) staggered table = 1.6x worse
(scatter-add rows don't coalesce); segment_sum-style forms "no better" —
but those used scatter-add segment sums. The untried structure is fully
scatter-FREE:

  S1: ONE sort by base cell id carrying (gm, wx, wy) payloads, per-channel
      corner weights computed post-sort, 4-channel prefix sum, per-cell
      sums as prefix differences at the (searchsorted) segment bounds —
      monotonic gathers only — then the (G, G, 4) staggered table folds
      into rho with 4 shifted adds.

Numerical note: prefix-difference segment sums cancel catastrophically
only when segment sums are tiny vs the running prefix; the experiment
reports max/rel error vs a float64 reference alongside the fp32 scatter
baseline's own error.

Run: python scripts/ablations/tune_r3f_scatter.py [N] [G]  (TPU; ~2 min)

MEASURED (v5e, N=1M, G=512, same session): S0 30.2 ms, S1 45.9 ms — the
sort (+payload channels) and 4-channel cumsum cost more than the four
scatter-adds they replace. NEGATIVE RESULT: the scatter-free form loses;
the 4x scatter-add stays the production scatter. (S0 and S1 agree with
each other to fp32 — the f64 column in early runs flagged a reference-
convention artifact, not an accuracy gap.)
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
G = int(sys.argv[2]) if len(sys.argv) > 2 else 512
K = 10

def kloop(piece, *args, k=K):
    @jax.jit
    def run(x, *rest):
        def body(i, s):
            return s + piece(x + 1e-18 * s, *rest).sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    float(run(*args)); t0 = time.perf_counter(); float(run(*args))
    return (time.perf_counter() - t0) * 1e3 / k

rng = np.random.default_rng(0)
ppos = np.concatenate([
    rng.random((N // 2, 2)),
    0.5 + 0.08 * rng.standard_normal((N // 2, 2)),
]).astype(np.float32).clip(0, 0.999999)
pos = jnp.asarray(ppos)
gm = jnp.asarray((rng.random(N) * 10).astype(np.float32))
lo = jnp.zeros(2, jnp.float32)
inv_h = jnp.float32(G)

from nbody_tpu.ops.pm_forces import _cic_scatter, _cic_weights

t0 = kloop(lambda p: _cic_scatter(p, gm, lo, inv_h, G), pos)
print(f"S0 4x scatter-add baseline: {t0:.1f} ms")

def s1(p, g):
    i0, j0, wx, wy = _cic_weights(p, lo, inv_h, G)
    c = i0 * G + j0
    c, gs, wxs, wys = jax.lax.sort((c, g, wx, wy), num_keys=1)
    w = jnp.stack([gs * (1 - wxs) * (1 - wys), gs * wxs * (1 - wys),
                   gs * (1 - wxs) * wys, gs * wxs * wys], axis=0)  # (4, N)
    pref = jnp.cumsum(w, axis=1)
    pref = jnp.pad(pref, ((0, 0), (1, 0)))                          # (4, N+1)
    b = jnp.searchsorted(c, jnp.arange(G * G + 1, dtype=jnp.int32))
    tab = (pref[:, b[1:]] - pref[:, b[:-1]])                        # (4, G²)
    t4 = tab.reshape(4, G, G)
    rho = jnp.zeros((G + 1, G + 1), jnp.float32)
    rho = rho.at[:G, :G].add(t4[0])
    rho = rho.at[1:, :G].add(t4[1])
    rho = rho.at[:G, 1:].add(t4[2])
    rho = rho.at[1:, 1:].add(t4[3])
    return rho[:G, :G]

t1 = kloop(lambda p: s1(p, gm), pos)
print(f"S1 sort + prefix-diff segment sums: {t1:.1f} ms")

# -- numerical quality vs float64 reference ----------------------------
# (weights from the UNCLIPPED floor, then clip — _cic_weights' convention;
# clipping first shifts boundary-cell weights and shows as a fake 1e-1
# "error" that S0 and S1 — which agree with each other — both carry)
pn = np.asarray(ppos, np.float64); gn = np.asarray(gm, np.float64)
u = pn[:, 0] * G - 0.5; v = pn[:, 1] * G - 0.5
fi = np.floor(u); fj = np.floor(v)
wx = u - fi; wy = v - fj
i0 = np.clip(fi.astype(np.int64), 0, G - 2)
j0 = np.clip(fj.astype(np.int64), 0, G - 2)
ref = np.zeros((G, G))
for di, dj, w in ((0, 0, (1-wx)*(1-wy)), (1, 0, wx*(1-wy)),
                  (0, 1, (1-wx)*wy), (1, 1, wx*wy)):
    np.add.at(ref, (i0 + di, j0 + dj), gn * w)
scale = np.abs(ref).max()
for name, fn in (("S0", lambda: _cic_scatter(pos, gm, lo, inv_h, G)),
                 ("S1", lambda: s1(pos, gm))):
    got = np.asarray(jax.jit(fn)())
    err = np.abs(got - ref)
    nz = ref != 0
    print(f"   {name} vs f64: max/scale {err.max()/scale:.2e}, "
          f"p99 rel (nonzero cells) "
          f"{np.percentile(err[nz]/np.abs(ref[nz]), 99):.2e}")
