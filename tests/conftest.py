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

# The suite runs on the in-process CPU mesh, so the CLI's remote-attached
# wedge probe (utils.check_device) would only burn a jax-import subprocess
# per main() call under this image's axon environment. The probe's own tests
# (test_device_check.py) opt back in with explicit scrubbed envs.
os.environ.setdefault("NBODY_TPU_NO_PROBE", "1")


# Fast CI tier: `pytest -m smoke` — a curated sub-60 s slice touching every
# test module (round-2 VERDICT weak #5). Selected for cheapness (tiny N,
# already-cached jit configs); the full suite remains the merge gate.
SMOKE = {
    "test_adaptive.py::test_force_free_world_takes_dt_max_steps",
    "test_app.py::test_bad_args_exit",
    "test_app.py::test_run_save_render",
    "test_autodiff.py::test_rollout_matches_world",
    "test_collisions.py::test_two_body_merge_conserves_everything",
    "test_compile_cache.py::test_entries_persist_and_are_counted",
    "test_extra_force.py::test_uniform_field_matches_euler_closed_form",
    "test_multihost.py::test_single_process_equivalence",
    "test_bench.py::test_bench_world_returns_us",
    "test_checkpoint.py::test_particles_roundtrip",
    "test_checks.py::test_nan_detected",
    "test_cpp_galaxy.py::test_counts_and_finiteness",
    "test_cpp_oracle.py::test_oracle_massless_rule",
    "test_diagnostics.py::test_kinetic_golden",
    "test_disks.py::test_kepler_disk_structure",
    "test_edge_cases.py::test_single_tracer_world",
    "test_forces.py::test_golden_two_body",
    "test_forces.py::test_softening_uses_target_radius_linear",
    "test_fuzz.py::test_tiny_n_on_many_devices",
    "test_galaxy.py::test_min_particles_validation",
    "test_galaxy.py::test_massless_tracers",
    "test_galaxy_device.py::test_validates_minimum",
    "test_golden.py::test_golden_scene_regeneration",
    "test_integrators.py::test_default_is_euler_reference_semantics",
    "test_invariants.py::test_two_body_circular_orbit",
    "test_libc_scene.py::test_libc_rand_known_answers",
    "test_libc_scene.py::test_scene_bitexact_vs_committed_reference_dump",
    "test_observables.py::test_custom_capture",
    "test_p3m.py::test_close_pair_is_reference_exact",
    "test_p3m.py::test_config_validation",
    "test_physics_validation.py::test_default_math_vs_sqrt_oracle_short",
    "test_plummer.py::test_deterministic",
    "test_pm.py::test_two_body_far_field_exact",
    "test_profiling.py::test_step_timer_accumulates",
    "test_render.py::test_classify_mass",
    "test_render.py::test_save_ppm",
    "test_ring_barrier.py::test_two_device_slot_pingpong",
    "test_ring_kernel.py::test_fused_ring_matches_single_device",
    "test_sharding.py::test_mesh_has_8_virtual_devices",
    "test_sharding.py::test_sharded_matches_single_device",
    "test_trajectory.py::test_record_matches_stepping",
    "test_types.py::test_constants",
    "test_types.py::test_sim_config_validation",
    "test_viewer.py::test_pause_and_backend_toggle",
    "test_world.py::test_partition_is_stable",
    "test_world.py::test_update_zero_steps_is_identity",
    "test_world.py::test_backend_switching_is_seamless",
}
# parametrized entries in SMOKE match only their cheapest instance
SMOKE_PARAMS = {
    "test_ring_kernel.py::test_fused_ring_matches_single_device": "[2]",
    "test_sharding.py::test_sharded_matches_single_device": "[2]",
    "test_libc_scene.py::test_libc_rand_known_answers": "[11037]",
    "test_libc_scene.py::test_scene_bitexact_vs_committed_reference_dump":
        "[300-1-3017237295]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        tail = item.nodeid.rsplit("/", 1)[-1]          # file.py::name[param]
        base = tail.split("[", 1)[0]
        if base in SMOKE:
            want = SMOKE_PARAMS.get(base)
            if want is None or tail == base + want:
                item.add_marker(pytest.mark.smoke)
    if not os.environ.get("NBODY_TPU_TESTS"):
        return
    if len(jax.devices()) >= 8:
        return
    skip = pytest.mark.skip(
        reason="NBODY_TPU_TESTS on a single device: multi-device test")
    multi_markers = ("sharding", "ring", "mesh", "sharded", "multichip",
                     "barrier", "multihost")
    for item in items:
        name = (item.nodeid or "").lower()
        if any(m in name for m in multi_markers):
            item.add_marker(skip)
