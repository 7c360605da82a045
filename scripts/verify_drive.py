#!/usr/bin/env python
"""End-to-end drive of the library surfaces on the live backend (the
/verify recipe, .claude/skills/verify): scene -> world -> update -> render,
plus the behavior probes (massless drift + exact reverse, single-particle
self-interaction, jnp/pallas backend mix mid-run, galaxy-count validation).

Run: timeout 500 python -u scripts/verify_drive.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu.render import fit_camera, render_frame, save_ppm

# 1. scene -> world -> update -> particles -> render
scene = nb.make_galaxies(6000, 3, seed=11037)
w = nb.create_world(scene)
w.update(0.01, 2000)
p = w.particles
assert np.all(np.isfinite(p.pos)), "NaNs after 2000 steps"
cam = fit_camera(np.asarray(p.pos), 640, 360)
frame = np.asarray(render_frame(p, cam))
assert frame.shape == (360, 640, 3) and (frame.sum(axis=-1) > 0).sum() > 100
save_ppm("/tmp/verify_frame.ppm", frame)
print(f"drive: N=6000 x 2000 steps OK; frame lit px="
      f"{(frame.sum(axis=-1) > 0).sum()}", flush=True)

# 2. probes
try:
    nb.make_galaxies(150, 2)
    raise SystemExit("FAIL: min-100-per-galaxy validation missing")
except ValueError:
    print("probe: make_galaxies(150, 2) ValueError OK", flush=True)

drift = nb.create_world(nb.make_particles(
    pos=[[0.0, 0.0], [10.0, 0.0]], vel=[[1.0, 0.0], [0.0, 1.0]],
    mass=[0.0, 0.0], radius=[0.5, 0.5]))
p0 = np.asarray(drift.particles.pos).copy()
drift.update(0.25, 8)
assert np.allclose(np.asarray(drift.particles.acc), 0.0)
drift.update(-0.25, 8)
np.testing.assert_allclose(np.asarray(drift.particles.pos), p0, atol=1e-5)
print("probe: massless pure drift + exact reverse OK", flush=True)

solo = nb.create_world(nb.make_particles(
    pos=[[3.0, 4.0]], vel=[[0.0, 0.0]], mass=[5.0], radius=[1.0]))
solo.update(0.1, 50)
np.testing.assert_allclose(np.asarray(solo.particles.pos), [[3.0, 4.0]],
                           atol=1e-6)
print("probe: single-particle self-interaction zero OK", flush=True)

mixed = nb.create_world(scene)
ref = nb.create_world(scene)
for i in range(6):
    mixed.update(0.01, 5, backend="jnp" if i % 2 else "pallas")
ref.update(0.01, 30, backend="jnp")
a, b = np.asarray(mixed.particles.pos), np.asarray(ref.particles.pos)
scale = np.abs(b).max()
err = np.abs(a - b).max() / scale
assert err < 1e-5, f"backend-mix divergence {err:.2e}"
print(f"probe: jnp/pallas mid-run mix consistent (rel {err:.1e}) OK",
      flush=True)
print("verify_drive: ALL OK", flush=True)
