"""Bench protocol unit tests (CPU, tiny N): JSON contract and measurement
plumbing — keeps bench.py from rotting between hardware runs."""

import json
import subprocess
import sys

sys.path.insert(0, ".")
import bench


def test_bench_world_returns_us():
    w = bench.make_world(250)
    us = bench.bench_world(w, "jnp", iters=3, warmup=1)
    assert us > 0


def test_primary_json_contract(capsys):
    class Args:
        n = 250
        iters = 2
        warmup = 1
        repeats = 1
        backend = "jnp"
        no_kernel_gates = True
        grid_gate_n = 0

    result = bench.run_primary(Args())
    assert set(result) == {"metric", "value", "unit", "vs_baseline",
                           "primary_backend", "primary_us_per_step"}
    assert result["unit"] == "pairs/s"
    assert result["value"] > 0
    assert result["vs_baseline"] == result["value"] / 1e11
    json.dumps(result)  # serializable


def test_grid_gates_independent_of_kernel_gates(capsys):
    """--no-kernel-gates covers the pallas/ring records ONLY; the grid
    gates are controlled solely by --grid-gate-n (review r5: nesting them
    under the kernel-gate switch silently dropped documented records)."""
    class Args:
        n = 250
        iters = 2
        warmup = 1
        repeats = 1
        backend = "jnp"
        no_kernel_gates = True
        grid_gate_n = 2048

    result = bench.run_primary(Args())
    assert "pallas_us_per_step" not in result
    assert "ring_virtual8" not in result
    assert result["p3m_us_per_step_n2048"] > 0
    assert result["pm_us_per_step_n2048"] > 0


def test_primary_kernel_gate_records(capsys):
    """With gates on, the primary record carries the pallas-kernel number
    (VERDICT r3: a kernel regression must move a driver artifact). The ring
    gate is exercised separately (test_ring_virtual8_gate)."""
    class Args:
        n = 250
        iters = 2
        warmup = 1
        repeats = 1
        backend = "pallas"  # primary == pallas -> kernel number reused
        no_kernel_gates = False
        grid_gate_n = 0

    import unittest.mock
    with unittest.mock.patch.object(bench, "ring_virtual8",
                                    return_value={"skipped": True}):
        result = bench.run_primary(Args())
    assert result["pallas_us_per_step"] == result["primary_us_per_step"]
    assert result["pallas_pairs_per_sec"] > 0
    assert result["ring_virtual8"] == {"skipped": True}
    json.dumps(result)


def test_primary_grid_gate_records(capsys):
    """The grid backends (what `auto` selects at large N) get their own
    driver-visible records (round-4 VERDICT task 4): a CIC/FFT/PP perf
    regression must move a number in BENCH_r{N}.json."""
    class Args:
        n = 250
        iters = 2
        warmup = 1
        repeats = 1
        backend = "jnp"
        no_kernel_gates = False
        grid_gate_n = 2048

    import unittest.mock
    with unittest.mock.patch.object(bench, "ring_virtual8",
                                    return_value={"skipped": True}):
        result = bench.run_primary(Args())
    assert result["p3m_us_per_step_n2048"] > 0
    assert result["pm_us_per_step_n2048"] > 0
    json.dumps(result)


def test_primary_pallas_crossover_tripwire(capsys):
    """If the pallas gate ever beats the jnp primary, the record must carry
    the revisit flag (round-4 VERDICT task 7: PALLAS_CROSSOVER_N = None is
    jaxlib-version-dependent and needs a tripwire, DESIGN.md §3)."""
    class Args:
        n = 250
        iters = 2
        warmup = 1
        repeats = 1
        backend = "jnp"
        no_kernel_gates = False
        grid_gate_n = 0

    import unittest.mock
    with unittest.mock.patch.object(bench, "ring_virtual8",
                                    return_value={"skipped": True}), \
         unittest.mock.patch.object(bench, "bench_world",
                                    side_effect=[100.0, 10.0, 20.0]):
        result = bench.run_primary(Args())
    assert result.get("revisit_pallas_crossover") is True
    # and the honest case: pallas slower -> no flag
    with unittest.mock.patch.object(bench, "ring_virtual8",
                                    return_value={"skipped": True}), \
         unittest.mock.patch.object(bench, "bench_world",
                                    side_effect=[10.0, 100.0, 100.0]):
        result = bench.run_primary(Args())
    assert "revisit_pallas_crossover" not in result


def test_ring_virtual8_gate():
    """The virtual-8 ring gate measures the sharded update in a CPU
    subprocess and returns a well-formed record."""
    rec = bench.ring_virtual8(n=1024, iters=2, timeout=600)
    assert "error" not in rec, rec
    assert rec["us_per_step"] > 0 and rec["devices"] == 8
    json.dumps(rec)


def test_cli_emits_single_json_line():
    out = subprocess.run(
        [sys.executable, "bench.py", "--n", "250", "--iters", "2",
         "--warmup", "1", "--repeats", "1", "--backend", "jnp",
         "--no-kernel-gates"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd=".",
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["unit"] == "pairs/s"


def test_cli_platform_flag_forces_cpu():
    """--platform cpu must work under the FULL inherited environment, where
    a sitecustomize presets the accelerator platform programmatically (env
    JAX_PLATFORMS is too late there) — both the probe subprocess and the
    bench itself get the in-process config update."""
    out = subprocess.run(
        [sys.executable, "bench.py", "--platform", "cpu", "--n", "250",
         "--iters", "2", "--warmup", "1", "--repeats", "1",
         "--backend", "jnp", "--no-kernel-gates"],
        capture_output=True, text=True, timeout=600, cwd=".",
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["value"] > 0 and "error" not in parsed


def test_cli_unreachable_device_emits_error_record():
    """With a dead backend the CLI must not hang at the first compile (the
    remote-tunnel wedge mode, TPU_STATUS_r03.md): the probe fails fast and a
    well-formed zero-value record with an `error` field is emitted."""
    out = subprocess.run(
        [sys.executable, "bench.py", "--n", "250"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "no_such_platform",
             "NBODY_BENCH_PROBE_ATTEMPTS": "1",
             "NBODY_BENCH_PROBE_TIMEOUT": "60",
             "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd=".",
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["value"] == 0.0 and "error" in parsed
    assert parsed["unit"] == "pairs/s"


def test_cli_profile_flag_writes_trace(tmp_path):
    """--profile wraps the primary run in a jax.profiler trace (the SURVEY §5
    tracing hook) and still emits exactly one JSON line on stdout."""
    d = str(tmp_path / "trace")
    out = subprocess.run(
        [sys.executable, "bench.py", "--n", "250", "--iters", "2",
         "--warmup", "1", "--repeats", "1", "--backend", "jnp",
         "--no-kernel-gates", "--profile", d],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd=".",
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1 and json.loads(lines[0])["value"] > 0
    import glob
    assert glob.glob(d + "/**/*.pb*", recursive=True) or \
        glob.glob(d + "/**/*.trace*", recursive=True), \
        f"no trace artifacts under {d}"
