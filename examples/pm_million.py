#!/usr/bin/env python
"""Million-particle galaxy collision at interactive rates with the
particle-mesh far-field backend (backend="pm": CIC -> FFT convolution ->
CIC; O(N + G^2 log G) per substep — ~100x the exact direct sum at N=1M on
a single v5e chip, docs/BENCHMARKS.md).

Usage: python examples/pm_million.py [n] [frames] [backend] [out.gif]
``backend`` may be "pm" (default, fastest, approximate near field) or
"p3m" (accurate at all ranges — mesh far field + exact short-range pair
correction, ~72 ms/substep at N=1M with rebin; pass p3m to see it). The
p3m run uses `p3m_rebin_interval=8` (Verlet-list amortization of the
cell sorts).
Writes <backend>_million.gif next to the script.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import nbody_tpu as nb
from nbody_tpu.types import SimConfig
from nbody_tpu.viewer import export_animation

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 60
BACKEND = sys.argv[3] if len(sys.argv) > 3 else "pm"

if N >= 8_000_000:
    # beyond-host-numpy scale: generate the scene on device (the 32M/64M
    # one-chip ceiling runs measured in scripts/scale_ceiling.py)
    import jax
    from nbody_tpu.models.galaxy_device import make_galaxies_device

    scene = make_galaxies_device(jax.random.key(11037), N, 2)
else:
    scene = nb.make_galaxies(N, 2, seed=11037)
grid = (2048 if N >= 8_000_000 else 1024) if BACKEND == "pm" else 512
world = nb.create_world(
    scene, config=SimConfig(pm_grid=grid, p3m_rebin_interval=8),
    default_backend=BACKEND)
print(f"N={world.total_len} massive={world.mass_len} "
      f"backend={BACKEND} grid={grid}")

t0 = time.perf_counter()
out = (sys.argv[4] if len(sys.argv) > 4 else
       os.path.join(os.path.dirname(__file__), f"{BACKEND}_million.gif"))
export_animation(world, out, frames=FRAMES, steps_per_frame=4, dt=0.005,
                 width=640, height=360)
dtv = time.perf_counter() - t0
print(f"{FRAMES} frames x 4 substeps in {dtv:.1f}s "
      f"({dtv / (FRAMES * 4) * 1e3:.0f} ms/substep incl. rendering) -> {out}")
assert np.all(np.isfinite(np.asarray(world.particles.pos)))
