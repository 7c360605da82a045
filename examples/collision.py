#!/usr/bin/env python
"""Two-galaxy collision, rendered headlessly to an animated GIF.

Usage: python examples/collision.py [out.gif] [n] [frames]
The analogue of watching the reference's raylib window (src/main.c), but all
simulation and rasterization stays on device; only uint8 frames come back.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

import nbody_tpu as nb
from nbody_tpu.render import fit_camera
from nbody_tpu.viewer import export_animation

out = sys.argv[1] if len(sys.argv) > 1 else "collision.gif"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
frames = int(sys.argv[3]) if len(sys.argv) > 3 else 150

scene = nb.make_galaxies(n, 2, seed=42)
world = nb.create_world(scene)
print(f"N={world.total_len} massive={world.mass_len} backend={world.default_backend}")

camera = fit_camera(np.asarray(scene.pos), 640, 360)
export_animation(world, out, frames=frames, steps_per_frame=8, dt=0.01,
                 width=640, height=360, camera=camera)
print(f"wrote {out}")
