#!/usr/bin/env python
"""Multi-device run: particles sharded over all available devices with the
ring all-gather force pass. Works on a TPU slice, or pass --cpu-demo to run
on an 8-device virtual CPU mesh.

Usage: python examples/sharded.py [n_particles] [--cpu-demo]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

# --cpu-demo: force an 8-device virtual CPU mesh (for machines without a
# TPU slice). Must happen before backends initialize, so it's an explicit
# flag, not an after-the-fact device query.
if "--cpu-demo" in sys.argv:
    sys.argv.remove("--cpu-demo")
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backends already up (e.g. interactive session); use as-is

import numpy as np

import nbody_tpu as nb
from nbody_tpu.diagnostics import summary
from nbody_tpu.parallel import ShardedWorld, make_mesh

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
mesh = make_mesh()
print(f"mesh: {mesh.devices.size} x {mesh.devices.flat[0].platform}")

scene = nb.make_galaxies(n, 2, seed=11037)
sw = ShardedWorld(scene, mesh)
print(f"N={sw.total_len} shards={sw.n_devices} targets/device={sw.t_loc} "
      f"sources/device={sw.s_loc} force={sw.force_backend}")

sw.update(0.01, 100)
host = sw.particles
print("after 100 substeps: finite =", bool(np.isfinite(np.asarray(host.pos)).all()))
print("momentum:", summary(sw)["momentum"] if hasattr(sw, "state") else
      tuple((np.asarray(host.mass)[:, None] * np.asarray(host.vel)).sum(axis=0)))

# --- round-2 additions: on-device capture + shard-native checkpointing ----
import tempfile

traj = sw.record(0.01, frames=5, steps_per_frame=4)  # ONE jitted scan,
print(f"captured {traj.shape} frames (single device->host gather)")

try:
    import orbax.checkpoint  # noqa: F401  (optional dependency)
except ImportError:
    print("orbax not installed - skipping the shard-native checkpoint demo")
else:
    from nbody_tpu.utils.checkpoint import (load_sharded_world_orbax,
                                            save_world_orbax)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_world_orbax(path, sw, step=120)  # each device writes its shard
        sw2, step = load_sharded_world_orbax(path, mesh,
                                             force_backend=sw.force_backend)
        print(f"restored at step {step}: each device read only its own "
              f"shard; sharding preserved = "
              f"{sw2.pos.sharding == sw.pos.sharding}")
