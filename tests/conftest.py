"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "fake backend" the reference lacks (SURVEY.md §4): multi-device
sharding tests run without a real TPU pod. Pallas kernels run in interpreter
mode on CPU (auto-detected in nbody_tpu.ops.pallas_forces).

Note: this image preimports jax at interpreter startup (axon sitecustomize),
so env vars like JAX_PLATFORMS are too late here — but backends initialize
lazily, so jax.config.update still wins as long as it runs before any
jax.devices() call.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
