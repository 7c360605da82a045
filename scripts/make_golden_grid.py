#!/usr/bin/env python
"""Generate the committed pm/p3m golden trajectories (tests/test_golden.py).

The direct-sum backends have had a golden net since round 2; the grid
backends (pm, p3m) only had error-envelope tests vs the exact sum, so a
silent cross-version numerical shift INSIDE the envelope (CIC order, FFT
kernel, PP taper) would have passed CI. This pins them: 10 frames x 5
substeps of a seeded 2-galaxy scene per backend, fp32, generated on the CPU
platform (the platform the test suite runs on).

Run from the repo root:  python scripts/make_golden_grid.py
Overwrites tests/data/golden_traj_grid_n2048_seed2024.npz.
"""
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import nbody_tpu as nb  # noqa: E402
from nbody_tpu.trajectory import record_trajectory  # noqa: E402
from helpers import GOLDEN_GRID  # noqa: E402

N = 2048
SEED = 2024
DT = 0.01
FRAMES = 10
STEPS = 5

out = pathlib.Path("tests/data") / f"golden_traj_grid_n{N}_seed{SEED}.npz"
scene = nb.make_galaxies(N, 2, seed=SEED)
data = {
    "pos0": np.asarray(scene.pos),
    "vel0": np.asarray(scene.vel),
    "mass": np.asarray(scene.mass),
    "radius": np.asarray(scene.radius),
}
for backend in ("pm", "p3m"):
    w = nb.create_world(scene, config=GOLDEN_GRID)
    traj = record_trajectory(w, DT, frames=FRAMES, steps_per_frame=STEPS,
                             backend=backend)
    data[f"traj_{backend}"] = np.asarray(traj)
    print(f"{backend}: traj {data[f'traj_{backend}'].shape} "
          f"max|x| {np.abs(data[f'traj_{backend}']).max():.4g}")

np.savez_compressed(out, **data)
print(f"wrote {out} ({out.stat().st_size} bytes)")
