#!/usr/bin/env python
"""End-to-end A/B for the PP empty-chunk skip (tune_r3g): full p3m
world.update at N=1M/4 galaxies, pp_chunk 64 vs 0, rebin 1 and 8.
Timing per the tunnel protocol: 32 substeps amortized in one jitted
update (same-session deltas only).

Run: python -u scripts/ablations/tune_r3g_world_ab.py   (on TPU; ~10 min)
"""
import sys, time
sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu.types import SimConfig

N, NGAL, DT, STEPS = 1_000_000, 4, 0.005, 32
scene = nb.make_galaxies(N, NGAL, seed=1)

for rebin in (1, 8):
    for pp_chunk in (0, 64):
        cfg = SimConfig(p3m_pp_chunk=pp_chunk, p3m_rebin_interval=rebin)
        w = nb.create_world(scene, config=cfg, default_backend="p3m")
        w.update(DT, 2)
        w.block_until_ready()  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            w.update(DT, STEPS)
            w.block_until_ready()
            best = min(best, (time.perf_counter() - t0) * 1e3 / STEPS)
        print(f"rebin={rebin} pp_chunk={pp_chunk:3d}: "
              f"{best:.1f} ms/substep", flush=True)
