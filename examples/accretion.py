#!/usr/bin/env python
"""Accretion demo: a cold dense cluster collapses and merges into a few
bodies under opt-in inelastic collision merging (SimConfig.merge_collisions
— no reference counterpart; see ops/collisions.py for the static-shape
merge design).

Usage: python examples/accretion.py [n] [steps] [out.gif]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nbody_tpu as nb
from nbody_tpu.types import SimConfig, make_particles

n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
out = sys.argv[3] if len(sys.argv) > 3 else None

rng = np.random.default_rng(11037)
half = 2.0 * np.sqrt(n)  # n-invariant density: a few bodies overlap at t=0
scene = make_particles(
    rng.uniform(-half, half, (n, 2)).astype(np.float32),
    vel=rng.normal(0, 0.5, (n, 2)).astype(np.float32),
    mass=rng.uniform(0.5, 2.0, n).astype(np.float32),
    radius=np.full(n, 0.8, np.float32),
)
world = nb.create_world(scene, config=SimConfig(merge_collisions=True))
m0 = float(scene.mass.sum())

if out:
    from nbody_tpu.viewer import export_animation

    # per-frame world.update goes through the same merging substep loop
    export_animation(world, out, frames=40, steps_per_frame=max(steps // 40, 1),
                     dt=0.01, width=480, height=480)
else:
    world.update(0.01, steps)

p = world.particles
survivors = int((p.mass > 0).sum())
print(f"N={n}: {survivors} massive bodies survive after {steps} substeps "
      f"({n - survivors} mergers); mass conserved: "
      f"{float(p.mass.sum()):.4f} / {m0:.4f}")
assert abs(float(p.mass.sum()) - m0) < 1e-3 * m0
if out:
    print(f"wrote {out}")
