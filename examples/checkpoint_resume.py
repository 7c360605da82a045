#!/usr/bin/env python
"""Checkpoint / resume round trip + trajectory export.

Usage: python examples/checkpoint_resume.py [n] [steps] [ckpt.npz] [traj.npz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nbody_tpu as nb
from nbody_tpu.trajectory import record_trajectory, save_trajectory
from nbody_tpu.utils import load_world, save_world

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
ckpt_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/nbody_ckpt.npz"
traj_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/nbody_traj.npz"

scene = nb.make_galaxies(n, 2, seed=7)
world = nb.create_world(scene)

world.update(0.01, steps)
save_world(ckpt_path, world, step=steps)
print(f"checkpointed at step {steps}")

resumed, step = load_world(ckpt_path)
print(f"resumed at step {step}; mass_len={resumed.mass_len}")

frames = min(50, steps)
traj = record_trajectory(resumed, 0.01, frames=frames, steps_per_frame=10)
save_trajectory(traj_path, traj, dt=np.float32(0.01))
print(f"recorded {traj.shape} trajectory "
      f"({frames} frames x 10 substeps, one device pass)")
