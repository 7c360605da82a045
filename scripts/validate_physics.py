#!/usr/bin/env python
"""Production-scale physics validation on real hardware.

Runs the flagship configuration (N=65k two-galaxy scene, Pallas kernel) for
thousands of substeps and reports conservation diagnostics — the de-facto
correctness harness the reference lacks (SURVEY.md §4).

Usage: python scripts/validate_physics.py [N] [steps] [backend] [integrator]
``backend`` defaults to "pallas"; pass "p3m"/"pm"/"jnp" to validate the
other backends' conservation behavior at production scale (the p3m run
doubles as the accuracy-at-horizon check of the mesh+PP force split).
``integrator`` defaults to "euler" (reference-exact); "leapfrog"/"yoshida4"
validate the symplectic compositions at horizon.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import nbody_tpu as nb
from nbody_tpu.diagnostics import summary

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
BACKEND = sys.argv[3] if len(sys.argv) > 3 else "pallas"
INTEGRATOR = sys.argv[4] if len(sys.argv) > 4 else "euler"
DT = 0.005

import dataclasses

from nbody_tpu.types import DEFAULT_SIM_CONFIG

scene = nb.make_galaxies(N, 2, seed=11037)
world = nb.create_world(
    scene, config=dataclasses.replace(DEFAULT_SIM_CONFIG,
                                      integrator=INTEGRATOR),
    default_backend=BACKEND)
s0 = summary(world)
e0 = s0["kinetic_energy"] + s0["potential_energy"]
p0 = np.array(s0["momentum"])
print(f"N={N} massive={world.mass_len} dt={DT} steps={STEPS} "
      f"backend={BACKEND} integrator={INTEGRATOR}")
print(f"start: E={e0:.6e}  p={p0}")

checkpoints = 4
for k in range(checkpoints):
    world.update(DT, STEPS // checkpoints)
    s = summary(world)
    e = s["kinetic_energy"] + s["potential_energy"]
    p = np.array(s["momentum"])
    pscale = abs(np.asarray(scene.mass, np.float64)).sum() * max(
        1.0, np.abs(np.asarray(scene.vel, np.float64)).max()
    )
    print(
        f"step {((k + 1) * STEPS) // checkpoints:6d}: "
        f"E={e:.6e} (drift {abs(e - e0) / abs(e0):.2e})  "
        f"|dp|/scale={np.linalg.norm(p - p0) / pscale:.2e}"
    )

host = world.particles
assert np.all(np.isfinite(np.asarray(host.pos))), "NaN in positions"
print("finite state: OK")
