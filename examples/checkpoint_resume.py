#!/usr/bin/env python
"""Checkpoint / resume round trip + trajectory export.

Usage: python examples/checkpoint_resume.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nbody_tpu as nb
from nbody_tpu.trajectory import record_trajectory, save_trajectory
from nbody_tpu.utils import load_world, save_world

scene = nb.make_galaxies(2000, 2, seed=7)
world = nb.create_world(scene)

world.update(0.01, 500)
save_world("/tmp/nbody_ckpt.npz", world, step=500)
print("checkpointed at step 500")

resumed, step = load_world("/tmp/nbody_ckpt.npz")
print(f"resumed at step {step}; mass_len={resumed.mass_len}")

traj = record_trajectory(resumed, 0.01, frames=50, steps_per_frame=10)
save_trajectory("/tmp/nbody_traj.npz", traj, dt=np.float32(0.01))
print(f"recorded {traj.shape} trajectory (50 frames x 10 substeps, one device pass)")
