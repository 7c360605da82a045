#!/usr/bin/env python
"""One-chip scale ceiling: pm at N=32M / 64M (round-2 VERDICT next #7).

Pushes the particle-mesh backend to the HBM limit of a single v5e chip:
the scene is generated ON DEVICE (models/galaxy_device.py — a 64M-particle
host scene would cost minutes of numpy + a 2.3 GB upload), the world is
created device-side, and ms/substep is measured by amortizing one
update(dt, n>=8) call (the tunnel-safe protocol). Reports device memory
from memory_stats() where the backend exposes it.

Usage: python scripts/scale_ceiling.py [N] [grid] [substeps]
Defaults N=33554432 grid=2048 substeps=8.
"""
import sys, time
sys.path.insert(0, ".")

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

import nbody_tpu as nb
from nbody_tpu.models.galaxy_device import make_galaxies_device
from nbody_tpu.types import SimConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32 * 1024 * 1024
GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
DT = 0.005

t0 = time.time()
scene = make_galaxies_device(jax.random.key(11037), N, 2)
jax.block_until_ready(scene.pos)
print(f"scene on device: N={N} in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
world = nb.create_world(scene, config=SimConfig(pm_grid=GRID),
                        default_backend="pm")
world.block_until_ready()
print(f"world created in {time.time()-t0:.1f}s "
      f"(massive={world.mass_len})", flush=True)

# warmup (compile)
world.update(DT, 1); world.block_until_ready()
t0 = time.perf_counter()
world.update(DT, STEPS); world.block_until_ready()
per = (time.perf_counter() - t0) * 1e3 / STEPS
print(f"pm N={N} grid={GRID}: {per:.0f} ms/substep "
      f"({N/per*1e3/1e6:.0f}M particle-updates/s)", flush=True)

pos = world.state.pos
assert bool(jnp.isfinite(pos).all()), "non-finite state"
try:
    stats = jax.devices()[0].memory_stats()
    print(f"memory: peak {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
          f"/ limit {stats.get('bytes_limit', 0)/2**30:.2f} GiB", flush=True)
except Exception as e:
    print(f"memory_stats unavailable: {e}", flush=True)
print("OK", flush=True)
