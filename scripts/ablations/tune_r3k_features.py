#!/usr/bin/env python
"""Round-3 feature overhead on real hardware: collision merging, the
extra_force hook, and adaptive stepping, against the plain direct-sum
baseline at the flagship N=65k config.

Questions this pins for docs/BENCHMARKS.md:
  1. merge pass overhead: the contact pass is a second O(M^2) mask sweep
     per substep over the massive prefix — expect roughly +0.3-0.6x the
     force cost on a contact-free scene (same pair count, cheaper math,
     no rsqrt chain).
  2. extra_force overhead on the jnp backend: one fused elementwise add —
     expect noise-level.
  3. adaptive stepping: per-substep criterion reduction + while_loop
     bookkeeping vs a fori_loop of the same substep count.

Timing per the tunnel protocol (32+ substeps amortized in one jitted
update; best-of-2; same-session deltas only).

Run: python -u scripts/ablations/tune_r3k_features.py [n] [steps]
(on TPU; ~4 min at defaults. Small arguments give a CPU smoke only.)
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.types import DEFAULT_SIM_CONFIG

DT = 0.005
N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def best_ms(run, reps=2):
    run(2)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(STEPS)
        best = min(best, (time.perf_counter() - t0) * 1e3 / STEPS)
    return best


scene = nb.make_galaxies(N, 2, seed=11037)

w = nb.create_world(scene)
base = best_ms(lambda k: w.update(DT, k, backend="jnp").block_until_ready())
print(f"baseline jnp       N={N}: {base:8.3f} ms/substep")

wm = nb.create_world(
    scene, config=dataclasses.replace(DEFAULT_SIM_CONFIG,
                                      merge_collisions=True))
merge = best_ms(lambda k: wm.update(DT, k, backend="jnp").block_until_ready())
print(f"+merge pass        N={N}: {merge:8.3f} ms/substep "
      f"({merge / base:.2f}x; contact-free scene, pure overhead)")


def field(pos, vel):
    return jnp.broadcast_to(jnp.asarray([0.0, -1e-6], jnp.float32), pos.shape)


wh = nb.create_world(scene)
hook = best_ms(lambda k: wh.update(DT, k, backend="jnp",
                                   extra_force=field).block_until_ready())
print(f"+extra_force hook  N={N}: {hook:8.3f} ms/substep "
      f"({hook / base:.2f}x)")

wa = nb.create_world(scene)
wa.update(DT, 2)  # warm + populate acc


def run_adaptive(k):
    # force fixed dt through the clamp so the substep count matches k
    wa.update_adaptive(DT * k, dt_min=DT, dt_max=DT, backend="jnp")
    wa.block_until_ready()


adapt = best_ms(run_adaptive)
print(f"adaptive loop      N={N}: {adapt:8.3f} ms/substep "
      f"({adapt / base:.2f}x; clamped dt == fixed-step count)")
