#!/usr/bin/env python
"""Measure the direct-sum vs p3m crossover that backend="auto" encodes
(world.AUTO_P3M_MIN_PAIRS): full world.update at default config, jnp vs
p3m, across the N ladder. Timing per the tunnel protocol (>=32 substeps
amortized in one jit; same-session A/B only).

Run: python -u scripts/ablations/tune_r3h_crossover.py [N ...]   (on TPU; ~10 min)
"""
import sys
import time

sys.path.insert(0, ".")
import nbody_tpu as nb

DT, STEPS = 0.005, 32
NS = ([int(a) for a in sys.argv[1:]]
      or [65_536, 131_072, 196_608, 262_144, 393_216])

for n in NS:
    scene = nb.make_galaxies(n, 2, seed=1)
    row = {}
    mass_len = None
    for backend in ("jnp", "p3m"):
        w = nb.create_world(scene, default_backend=backend)
        mass_len = w.mass_len
        w.update(DT, 2)
        w.block_until_ready()  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            w.update(DT, STEPS)
            w.block_until_ready()
            best = min(best, (time.perf_counter() - t0) * 1e3 / STEPS)
        row[backend] = best
        del w
    pairs = n * mass_len  # actual massive count (scene-dependent fraction)
    pick = "jnp" if row["jnp"] <= row["p3m"] else "p3m"
    print(f"N={n:7d} pairs={pairs:.2e}: jnp {row['jnp']:7.1f} ms  "
          f"p3m {row['p3m']:7.1f} ms  -> {pick}", flush=True)
