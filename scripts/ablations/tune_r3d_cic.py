#!/usr/bin/env python
"""Round-3 CIC gather/scatter restructuring experiments (N=1M, grid=512).

The round-2 profile left CIC as the measured floor: gather 48 ms + scatter
17 ms at N=1M (8M bilinear corner elements; tune_r3c showed combining the 4
corner gathers into one 4M-index ELEMENT gather is noise, and slice-gathers
via vmapped dynamic_slice are 40x worse). A Mosaic probe (this round) also
killed the Pallas-gather idea: the only supported in-kernel dynamic gather
(lane-direction take_along_axis, 128-wide) measures ~16 ns/element vs XLA's
~6 ns/element — a kernel cannot beat the XLA floor with a slower primitive.

What's NOT yet tried: changing the SHAPE of the access, not its engine.
  R2: pre-flatten the 2x2x2ch patch per fine cell into a (G^2, 8) table
      (4 shifted copies, static relayout) -> ONE row-gather per particle
      (contiguous 32B rows, embedding-lookup shape) + elementwise bilinear.
  R3: the same at coarse (gc) granularity: (gc^2, 72) table of the 6x6
      patch x 2ch -> one row-gather per particle by COARSE cell.
  R5: zero-gather form for packed targets (p3m already packs targets into
      (gc, gc, cap) panels): 36 strided slices of the padded force grid give
      every coarse cell its 6x6 patch; bilinear = a 36-way masked
      select-accumulate, pure VPU broadcast arithmetic.
  R6: scatter as ONE (N,4)-row scatter-add into a (G^2, 4) staggered table
      + 4 shifted adds, vs the current 4 element scatter-adds.

Run: python scripts/ablations/tune_r3d_cic.py  (on TPU; ~3 min)
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

N = 1_000_000
G = 512
GC = 128
CAP = 96
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
# clustered positions in [0, 1): mimic galaxy clustering (half gaussian core)
ppos = np.concatenate([
    rng.random((N // 2, 2)),
    0.5 + 0.08 * rng.standard_normal((N // 2, 2)),
]).astype(np.float32).clip(0, 0.999999)
pos = jnp.asarray(ppos)
grid2 = jnp.asarray(rng.standard_normal((G, G, 2)).astype(np.float32))
lo = jnp.zeros(2, jnp.float32); h = jnp.float32(1.0 / G); inv_h = 1.0 / h

from nbody_tpu.ops.pm_forces import _cic_weights, _cic_gather, _cic_scatter

# -- baselines ---------------------------------------------------------
print(f"R0 element-gather CIC baseline: {kloop(lambda p: _cic_gather(grid2, p, lo, inv_h, G), pos):.1f} ms")
gm = jnp.asarray(rng.random(N).astype(np.float32))
print(f"R0s element-scatter CIC baseline: {kloop(lambda p: _cic_scatter(p, gm, lo, inv_h, G), pos):.1f} ms")

# -- R2: row-gather from pre-flattened patch table ---------------------
def r2(p, a):
    i0, j0, wx, wy = _cic_weights(p, lo, inv_h, G)
    # patch table: row c = flat(i,j) holds [A[i,j], A[i+1,j], A[i,j+1], A[i+1,j+1]] x 2ch
    ap = jnp.pad(a, ((0, 1), (0, 1), (0, 0)))
    tab = jnp.concatenate([
        ap[:G, :G], ap[1:G+1, :G], ap[:G, 1:G+1], ap[1:G+1, 1:G+1]
    ], axis=-1).reshape(G * G, 8)
    rows = tab[i0 * G + j0]                       # (N, 8) ONE row gather
    w = jnp.stack([(1-wx)*(1-wy), wx*(1-wy), (1-wx)*wy, wx*wy], -1)  # (N,4)
    return (rows.reshape(N, 4, 2) * w[..., None]).sum(1)

t_r2 = kloop(lambda p: r2(p, grid2), pos)
print(f"R2 row-gather (N,8) from (G^2,8): {t_r2:.1f} ms")
# correctness
ref = np.asarray(_cic_gather(grid2, pos, lo, inv_h, G))
got = np.asarray(jax.jit(r2)(pos, grid2))
print(f"   R2 max err: {np.abs(got - ref).max():.2e}")

# -- R6: one (N,4)-row scatter-add + shifted combines ------------------
def r6(p, gmv):
    i0, j0, wx, wy = _cic_weights(p, lo, inv_h, G)
    w = jnp.stack([(1-wx)*(1-wy), wx*(1-wy), (1-wx)*wy, wx*wy], -1) * gmv[:, None]
    tabs = jnp.zeros((G * G, 4), jnp.float32).at[i0 * G + j0].add(w)
    t4 = tabs.reshape(G, G, 4)
    rho = jnp.zeros((G + 1, G + 1), jnp.float32)
    rho = rho.at[:G, :G].add(t4[:, :, 0])
    rho = rho.at[1:, :G].add(t4[:, :, 1])
    rho = rho.at[:G, 1:].add(t4[:, :, 2])
    rho = rho.at[1:, 1:].add(t4[:, :, 3])
    return rho[:G, :G]   # clip semantics differ at edges vs baseline; interior identical
t_r6 = kloop(lambda p: r6(p, gm), pos)
print(f"R6 row-scatter (N,4) + shifted adds: {t_r6:.1f} ms")
ref_s = np.asarray(_cic_scatter(pos, gm, lo, inv_h, G))
got_s = np.asarray(jax.jit(r6)(pos, gm))
print(f"   R6 interior err: {np.abs(got_s[1:-1,1:-1] - ref_s[1:-1,1:-1]).max():.2e} (edges differ by clip design: {np.abs(got_s-ref_s).max():.2e})")

# -- R3: coarse-cell row gather of 6x6 patch --------------------------
def r3(p, a):
    i0, j0, wx, wy = _cic_weights(p, lo, inv_h, G)
    I = jnp.clip((i0 // 4), 0, GC - 1); J = jnp.clip((j0 // 4), 0, GC - 1)
    ap = jnp.pad(a, ((1, 2), (1, 2), (0, 0)))
    # (gc, gc, 6, 6, 2): patch[I, J, di, dj] = A[4I+di-1, 4J+dj-1]
    slices = [ap[di:di+G:4 if False else 1] for di in range(1)]  # placeholder
    rows = []
    for di in range(6):
        cols = []
        for dj in range(6):
            cols.append(ap[di:di+4*GC:4, dj:dj+4*GC:4])  # (gc, gc, 2)
        rows.append(jnp.stack(cols, axis=2))
    tab = jnp.stack(rows, axis=2)            # (gc, gc, 6, 6, 2)
    tab = tab.reshape(GC * GC, 72)
    got_rows = tab[I * GC + J]               # (N, 72) row gather
    dfi = i0 - 4 * I; dfj = j0 - 4 * J       # in [-1, 3]
    pr = got_rows.reshape(N, 6, 6, 2)
    di = jnp.arange(6)[None, :] - 1
    cxa = (dfi[:, None] == di) * (1 - wx[:, None]) + ((dfi[:, None] + 1) == di) * wx[:, None]
    cyb = (dfj[:, None] == di) * (1 - wy[:, None]) + ((dfj[:, None] + 1) == di) * wy[:, None]
    return jnp.einsum("nijc,ni,nj->nc", pr, cxa, cyb)
t_r3 = kloop(lambda p: r3(p, grid2), pos)
got3 = np.asarray(jax.jit(r3)(pos, grid2))
print(f"R3 coarse row-gather (N,72): {t_r3:.1f} ms, max err {np.abs(got3 - ref).max():.2e}")
