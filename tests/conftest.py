"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "fake backend" the reference lacks (SURVEY.md §4): multi-device
sharding tests run without a real TPU pod. Pallas kernels run in interpreter
mode on CPU (auto-detected in nbody_tpu.ops.pallas_forces).

Set ``NBODY_TPU_TESTS=1`` to run on whatever accelerator jax finds instead
(single real chip): single-chip tests then exercise the REAL compiled
kernels; multi-device tests skip themselves when fewer than 8 devices
exist. Compiles go through the device toolchain, so expect minutes, and use
a curated selection, e.g.::

    NBODY_TPU_TESTS=1 pytest tests/test_forces.py tests/test_world.py \
        tests/test_golden.py tests/test_integrators.py -q

Note: this image preimports jax at interpreter startup (axon sitecustomize),
so env vars like JAX_PLATFORMS are too late here — but backends initialize
lazily, so jax.config.update still wins as long as it runs before any
jax.devices() call.
"""

import os

import jax
import pytest

if not os.environ.get("NBODY_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)


def pytest_collection_modifyitems(config, items):
    if not os.environ.get("NBODY_TPU_TESTS"):
        return
    if len(jax.devices()) >= 8:
        return
    skip = pytest.mark.skip(
        reason="NBODY_TPU_TESTS on a single device: multi-device test")
    multi_markers = ("sharding", "ring", "mesh", "sharded", "multichip",
                     "barrier")
    for item in items:
        name = (item.nodeid or "").lower()
        if any(m in name for m in multi_markers):
            item.add_marker(skip)
