#!/usr/bin/env python
"""Round-3 p3m spatial-bookkeeping experiments (N=1M, gc=128, cap=96).

After the patch-row CIC gather, the p3m substep at N=1M is bookkeeping-
bound: the block packs, their feeding 1M-row permutation gathers, and the
unpack's order-restoring sort cost more than the pair math (~17 ms).
Applying the tune_r3d lesson (TPU gather cost is per index) to the pack
*index structure* rather than the engine:

  P0: current production pack = [order] permutation gather (1M rows, 3ch)
      + _gather_blocks (one index per slot, gc²·cap = 1.57M indices).
  P1: sliding-WINDOW pack — (N, B*C) table of sorted rows [i, i+B) fetched
      with ceil(cap/B) indices per cell. (Measured: the B shifted (N, 3)
      views each materialize T(8,128)-padded — 488 MB a piece — and the
      gain tops out ~25% at B=4; B=32 OOMs compile. Negative result.)
  P2: COMPOSITE-index pack — precompute oidx[c,k] = order[starts[c]+k]
      (position-independent => frozen-bins-cacheable) and gather the
      ORIGINAL rows once: same 1.57M indices as P0's second gather but the
      1M-row permutation gather disappears entirely.
  P3: unpack restore — current slot-gather + lax.sort vs ONE precomputed
      flat-index gather (index/mask also frozen-bins-cacheable).

Run: python scripts/ablations/tune_r3e_block_pack.py  (on TPU; ~2 min)
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

N = 1_000_000
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
ppos = np.concatenate([
    rng.random((N // 2, 2)),
    0.5 + 0.08 * rng.standard_normal((N // 2, 2)),
]).astype(np.float32).clip(0, 0.999999)
pos = jnp.asarray(ppos)
gm = jnp.asarray(rng.random(N).astype(np.float32))
lo = jnp.zeros(2, jnp.float32)
inv_c = jnp.float32(GC)  # unit box -> cell = 1/GC

from nbody_tpu.ops.p3m_forces import _cell_pack, _gather_blocks

order, cid, rank, counts = jax.jit(
    lambda p, g: _cell_pack(p, lo, inv_c, GC, priority=g))(pos, gm)
rows_orig = jnp.concatenate([pos, gm[:, None]], axis=-1)  # (N, 3) ORIGINAL
print(f"cells over cap: {int((np.asarray(counts) > CAP).sum())} / {GC*GC}")

starts = (jnp.cumsum(counts) - counts).astype(jnp.int32)
slot = jnp.arange(CAP, dtype=jnp.int32)
ok = slot[None, :] < jnp.minimum(counts, CAP)[:, None]        # (gc², cap)

# -- P0: permutation gather + per-slot pack (current production) -------
def p0(r):
    sr = r[order]
    return jnp.stack(_gather_blocks(
        [(sr[:, 0], 0.0), (sr[:, 1], 0.0), (sr[:, 2], 0.0)],
        counts, GC, CAP), axis=-1)         # (gc, gc, cap, 3)

t0 = kloop(p0, rows_orig)
print(f"P0 permute + per-slot pack (3ch): {t0:.1f} ms")
ref = np.asarray(jax.jit(p0)(rows_orig))

# -- P2: composite-index pack ------------------------------------------
oidx = order[jnp.minimum(starts[:, None] + slot[None, :], N - 1)]  # frozen
def p2(r):
    got = r[oidx]                           # (gc², cap, 3) ONE gather
    return jnp.where(ok[..., None], got, 0.0).reshape(GC, GC, CAP, 3)

t2 = kloop(p2, rows_orig)
err = np.abs(np.asarray(jax.jit(p2)(rows_orig)) - ref).max()
print(f"P2 composite-index pack: {t2:.1f} ms  (max err vs P0: {err:.1e})")

# -- P3: unpack restore ------------------------------------------------
corr = jnp.asarray(rng.standard_normal((GC * GC, CAP, 2)).astype(np.float32))

def p3_sort(c):
    safe = jnp.minimum(rank, CAP - 1)
    got = c[cid, safe]
    got = jnp.where((rank < CAP)[:, None], got, 0.0)
    _, ox, oy = jax.lax.sort((order, got[:, 0], got[:, 1]), num_keys=1)
    return jnp.stack([ox, oy], axis=-1)

# precomputed (bins-cacheable) composite index + mask in ORIGINAL order
inv = jnp.argsort(order)
flat = (cid * CAP + jnp.minimum(rank, CAP - 1))[inv]
okmask = (rank < CAP)[inv]

def p3_flat(c):
    got = c.reshape(GC * GC * CAP, 2)[flat]
    return jnp.where(okmask[:, None], got, 0.0)

ts = kloop(p3_sort, corr)
tf = kloop(p3_flat, corr)
err = np.abs(np.asarray(jax.jit(p3_sort)(corr)) - np.asarray(jax.jit(p3_flat)(corr))).max()
print(f"P3 unpack sort-restore: {ts:.1f} ms   flat-index gather: {tf:.1f} ms  (err {err:.1e})")
