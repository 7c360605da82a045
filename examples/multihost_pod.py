#!/usr/bin/env python
"""Multi-host pod run: one simulation spanning every process's devices.

Launch the SAME script on every host of a pod slice (e.g. one per TPU VM):

    # on each v5e-16 VM (4 hosts x 4 chips):
    python examples/multihost_pod.py 1000000 --distributed

With --distributed, `multihost.initialize()` auto-detects coordinator/rank
from the TPU metadata (jax.distributed must initialize BEFORE the local
backend — hence an explicit flag, not an after-the-fact device query); on
non-TPU launchers pass coordinator/rank explicitly (see
nbody_tpu/parallel/multihost.py). Without the flag this is a single
process over its local devices — the script runs standalone, and
--cpu-demo fakes an 8-device CPU mesh.

Usage: python examples/multihost_pod.py [n_particles] [--cpu-demo] [--distributed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu-demo" in sys.argv:
    sys.argv.remove("--cpu-demo")
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backends already up (e.g. interactive session); use as-is

import numpy as np

import nbody_tpu as nb
from nbody_tpu.parallel import multihost

if "--distributed" in sys.argv:
    sys.argv.remove("--distributed")
    multihost.initialize()

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
# Seeded host-side synthesis: every process builds the identical scene, so
# nothing is broadcast; each uploads only its local devices' rows.
scene = nb.make_galaxies(n, 2, seed=11037)
world = multihost.multihost_world(scene)
print(f"process {jax.process_index()}/{jax.process_count()}: "
      f"{len(jax.local_devices())} local of {len(jax.devices())} global "
      f"devices; N={world.total_len} targets/device={world.t_loc}")

world.update(0.01, 100)

# Replicated full host copy (ShardedWorld.particles only sees local shards).
parts = multihost.gather_particles(world)
p = (np.asarray(parts.mass)[:, None] * np.asarray(parts.vel)).sum(axis=0)
print(f"after 100 substeps: finite={bool(np.isfinite(parts.pos).all())} "
      f"momentum=({p[0]:.3e}, {p[1]:.3e})")
