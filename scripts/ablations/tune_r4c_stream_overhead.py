#!/usr/bin/env python
"""Isolate the streaming kernel's +21.6% at N=1M (round 4): run streaming
and resident modes at the SAME source size (S ~ 130k, resident-capable), so
the pair math is identical and only the machinery differs; then A/B the
knobs (dimension_semantics, DMA block size) on whichever shows the gap.

Run: python -u scripts/ablations/tune_r4c_stream_overhead.py   (on TPU, ~15 min)
"""
import sys
import time

import jax

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu.ops import pallas_forces as pf

DT = 0.005
N = 262_144
STEPS = 16

scene = nb.make_galaxies(N, 2, seed=11037)


def run(label, backend="pallas"):
    w = nb.create_world(scene, default_backend=backend)
    w.update(DT, 2)
    w.block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        w.update(DT, STEPS)
        w.block_until_ready()
        best = min(best, (time.perf_counter() - t0) * 1e3 / STEPS)
    print(f"{label:44s} {best:8.1f} ms/substep", flush=True)
    del w
    return best


base = run("jnp", backend="jnp")
res = run("pallas RESIDENT (S~130k fits)")

# force streaming at the same S (world.py holds an imported-by-value copy
# that sizes the source padding)
pf.RESIDENT_SOURCE_MAX = 1
nb.world.RESIDENT_SOURCE_MAX = 1
# Measured 2026-08-19 (this script): tile_t is THE lever in streaming mode —
# at S=131072 forced-stream, tile 1024: +1.2-2.2% vs resident; tile 512:
# +21-22%; tile 256: +35% (unlike the resident kernel, where 1024/512/256
# measure within noise). blk=32768 edges 16384 (+1.2% vs +2.2%).
for blk in (32768, 16384):
    jax.clear_caches()
    pf.STREAM_SRC_BLOCK = blk
    ms = run(f"pallas STREAM v5 blk={blk}")
    print(f"    -> vs resident: {(ms - res) / res * 100:+.1f}%", flush=True)
