#!/usr/bin/env python
"""Integrator cost table on real hardware: µs/substep for euler / leapfrog /
yoshida4 on the flagship direct-sum config (N=65k) and ms/substep for
pm/p3m at N=1M. Expectation from the composition structure: leapfrog ≈
euler (1 force eval + one extra fused drift), yoshida4 ≈ 3× (3 force
evals); this pins the measured ratios for docs/BENCHMARKS.md.

Timing per the tunnel protocol (32+ substeps amortized in one jitted
update; best-of-2; same-session deltas only).

Run: python -u scripts/ablations/tune_r3j_integrators.py [n_direct] [n_mesh] [steps]
(on TPU; ~6 min at defaults. Small arguments give a CPU smoke only —
cross-platform numbers are meaningless.)
"""
import sys
import time

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu.types import SimConfig

DT = 0.005
N_DIRECT = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
N_MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = per-config default


def best_ms(w, steps, reps=2):
    w.update(DT, 2)
    w.block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        w.update(DT, steps)
        w.block_until_ready()
        best = min(best, (time.perf_counter() - t0) * 1e3 / steps)
    return best


scene_direct = nb.make_galaxies(N_DIRECT, 2, seed=11037)
for integ in ("euler", "leapfrog", "yoshida4"):
    w = nb.create_world(scene_direct, config=SimConfig(integrator=integ))
    ms = best_ms(w, STEPS or 200)
    pairs = w.total_len * w.mass_len / (ms / 1e3)
    print(f"direct {N_DIRECT} {integ:9s}: {ms * 1e3:8.1f} µs/substep "
          f"({pairs:.3e} pairs/s)", flush=True)

scene_mesh = nb.make_galaxies(N_MESH, 4, seed=1)
for backend, grid, steps in (("pm", 1024, 64), ("p3m", 512, 32)):
    for integ in ("euler", "leapfrog", "yoshida4"):
        cfg = SimConfig(integrator=integ, pm_grid=grid,
                        p3m_rebin_interval=8 if backend == "p3m" else 1)
        w = nb.create_world(scene_mesh, config=cfg, default_backend=backend)
        print(f"{backend} {N_MESH} {integ:9s}: "
              f"{best_ms(w, STEPS or steps):7.1f} ms/substep", flush=True)
