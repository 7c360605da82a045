#!/usr/bin/env python
"""Shape probe for the round-4 in-kernel-DMA streaming kernel: tile_t cap /
chunk / DMA-block variants vs the jnp backend at the streaming sizes.
Each variant clears jit caches (STREAM_* are module globals, not static jit
args). Run: python -u scripts/ablations/tune_r4b_stream_shapes.py [N]
"""
import dataclasses
import sys
import time

import jax

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu.ops import pallas_forces as pf

DT = 0.005
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
STEPS = 8 if N > 400_000 else 32

scene = nb.make_galaxies(N, 2, seed=11037)


def run(backend, config=None, label=""):
    w = nb.create_world(scene, config=config or nb.DEFAULT_SIM_CONFIG,
                        default_backend=backend)
    w.update(DT, 2)
    w.block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        w.update(DT, STEPS)
        w.block_until_ready()
        best = min(best, (time.perf_counter() - t0) * 1e3 / STEPS)
    rate = w.total_len * w.mass_len / best * 1e3
    print(f"{label:36s} {best:9.1f} ms/substep  {rate / 1e11:.2f}e11 pairs/s",
          flush=True)
    return best


base = run("jnp", label=f"jnp N={N}")

# Hypothesis (a): the streaming gap is mostly STREAM_TILE_CAP=512 halving
# the per-source vreg reuse vs the resident kernel's tile_t=1024. Quantify
# the cap's cost alone on the RESIDENT kernel at a resident-sized scene.
if "--resident-cap" in sys.argv:
    scene_r = nb.make_galaxies(262_144, 2, seed=11037)
    sv = globals()
    sv["scene"], sv["STEPS"] = scene_r, 16
    rbase = run("jnp", label="jnp N=262144")
    for tt in (1024, 512, 256):
        jax.clear_caches()
        cfg = dataclasses.replace(nb.DEFAULT_SIM_CONFIG, tile_targets=tt)
        ms = run("pallas", cfg, label=f"resident tile_t={tt}")
        print(f"    -> vs jnp: {(ms - rbase) / rbase * 100:+.1f}%", flush=True)
    sys.exit(0)

# v5 knobs: stream source-block width x chunk
VARIANTS = [
    (32768, 2048),
    (16384, 2048),
    (32768, 4096),
    (65536, 2048),
]
for blk, ts in VARIANTS:
    jax.clear_caches()
    pf.STREAM_SRC_BLOCK = blk
    cfg = dataclasses.replace(nb.DEFAULT_SIM_CONFIG, tile_sources=ts)
    label = f"pallas blk={blk} chunk={ts}"
    try:
        ms = run("pallas", cfg, label=label)
        print(f"    -> vs jnp: {(ms - base) / base * 100:+.1f}%", flush=True)
    except Exception as e:  # noqa: BLE001 — probe must report and continue
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
