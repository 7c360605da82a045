#!/usr/bin/env python
"""Kernel autotune sweep on real TPU: tile sizes x precision mode.

Usage: python scripts/ablations/tune_kernel.py [N] [--steps]
Reports pairs/s for the raw force kernel (and optionally the full fused step).
"""

import itertools
import sys
import time

import jax

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu.ops.pallas_forces import pallas_acc

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 65536

scene = nb.make_galaxies(N, 2, seed=11037)
w = nb.create_world(scene)
pos, radius = w.state.pos, w.state.radius
src_pos = w.state.pos[: w.src_len]
src_gm = w.gm[: w.src_len]
t, s = pos.shape[0], src_pos.shape[0]
print(f"N={N} padded targets={t} sources={s}", file=sys.stderr)

ITERS = 30
results = []
for tt, ts, precise in itertools.product(
    (256, 512, 1024, 2048), (512, 1024, 2048, 4096, 8448), (True, False)
):
    if t % tt or s % min(ts, s) or ts > s + 0:
        continue
    if s % ts:
        continue
    try:
        fn = jax.jit(
            lambda p, r, sp, sg: pallas_acc(
                p, r, sp, sg, tile_targets=tt, tile_sources=ts, precise=precise
            )
        )
        out = fn(pos, radius, src_pos, src_gm)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(pos, radius, src_pos, src_gm)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        rate = t * s / dt
        results.append((rate, tt, ts, precise, dt))
        print(f"tt={tt:5} ts={ts:5} precise={precise!s:5}  {dt*1e6:9.1f} us  {rate:.3e} pairs/s", file=sys.stderr)
    except Exception as e:
        print(f"tt={tt:5} ts={ts:5} precise={precise!s:5}  FAIL {type(e).__name__}: {str(e)[:120]}", file=sys.stderr)

results.sort(reverse=True)
print("\nTOP 5:", file=sys.stderr)
for rate, tt, ts, precise, dt in results[:5]:
    print(f"  {rate:.3e} pairs/s  tt={tt} ts={ts} precise={precise} ({dt*1e6:.1f} us)", file=sys.stderr)
