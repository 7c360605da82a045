#!/usr/bin/env python
"""Benchmark CLI — protocol of the reference's src/bench.c, extended.

Reference protocol (bench.c:22-53): 2-galaxy scene, fixed seed 11037, 10
warmup updates + 100 timed updates per backend, report µs/update, over an N
ladder. Here additionally: pair-interactions/sec/chip (the BASELINE.json
primary metric) and the larger-N configs (65k single chip, 1M headless).

Prints ONE JSON line for the driver:
  {"metric": "pair_interactions_per_sec_per_chip_n65536", "value": ...,
   "unit": "pairs/s", "vs_baseline": value / 1e11}
(vs_baseline is against the 1e11 pairs/s/chip north-star target; the
reference publishes no numbers of its own — BASELINE.md.)

Everything else (ladder tables, per-size timings) goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax

import nbody_tpu as nb

# Reference ladder (bench.c:38) plus the BASELINE.json configs.
REFERENCE_SIZES = [250, 500, 800, 1200, 2000, 4000, 10000, 20000, 50000, 100000]
EXTRA_SIZES = [65536, 262144, 1048576]

SEED = 11037  # bench.c:42
WARMUP_ITER = 10  # bench.c:22
BENCH_ITER = 100  # bench.c:23
UPDATE_STEP = 1.0  # bench.c:21


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_world(world: nb.World, backend: str, iters: int = BENCH_ITER,
                warmup: int = WARMUP_ITER) -> float:
    """10 warmup + `iters` timed substeps, fused in single update calls
    (bench.c:25-35). Returns µs per substep."""
    world.update(UPDATE_STEP, warmup, backend=backend)
    world.block_until_ready()
    t0 = time.perf_counter()
    world.update(UPDATE_STEP, iters, backend=backend)
    world.block_until_ready()
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e6


def make_world(n: int, config=None) -> nb.World:
    scene = nb.make_galaxies(n, 2, seed=SEED)
    return nb.create_world(scene, config=config or nb.DEFAULT_SIM_CONFIG)


def run_ladder(args):
    sizes = [s for s in (REFERENCE_SIZES + EXTRA_SIZES if args.extra else REFERENCE_SIZES)
             if s <= args.max_n]
    backends = []
    if args.cpu:
        backends.append("jnp")
    if args.gpu:
        backends.append("pallas")
    log(f"platform={jax.default_backend()} devices={jax.devices()}")
    log(f"{'N':>9} " + " ".join(f"{b:>12}" for b in backends) + "   (µs/update)")
    for n in sizes:
        row = [f"{n:>9}"]
        pairs_rate = {}
        for b in backends:
            w = make_world(n)
            # amortize the per-call host->device round trip (tens of ms on
            # remote-attached devices): keep device time per timed call well
            # above the RTT at every size, and take the best of several
            # calls at small N where a single RTT hiccup dominates
            if n <= 2000:
                iters, reps = 3000, 4
            elif n <= 50000:
                iters, reps = 500, 2
            elif n <= 200000:
                iters, reps = BENCH_ITER, 2
            else:
                iters, reps = 10, 1
            us = min(bench_world(w, b, iters, warmup=WARMUP_ITER if r == 0 else 0)
                     for r in range(reps))
            row.append(f"{us:>12.1f}")
            pairs_rate[b] = w.total_len * w.mass_len / (us / 1e6)
            del w
        log(" ".join(row) + "   " +
            " ".join(f"{b}:{pairs_rate[b]:.3e} pairs/s" for b in backends))


def run_sharded(args) -> None:
    """Sharded-world timing over all local devices (meaningful on a pod
    slice; degenerates to 1 shard on a single chip)."""
    from nbody_tpu.parallel import ShardedWorld, make_mesh

    mesh = make_mesh()
    scene = nb.make_galaxies(args.n, 2, seed=SEED)
    sw = ShardedWorld(scene, mesh)
    sw.update(UPDATE_STEP, args.warmup)
    sw.block_until_ready()
    t0 = time.perf_counter()
    sw.update(UPDATE_STEP, args.iters)
    sw.block_until_ready()
    us = (time.perf_counter() - t0) / args.iters * 1e6
    d = mesh.devices.size
    log(f"sharded: N={args.n} devices={d} force={sw.force_backend} "
        f"{us:.1f} µs/step {sw.total_len * sw.mass_len / (us / 1e6):.3e} pairs/s "
        f"({sw.total_len * sw.mass_len / (us / 1e6) / d:.3e} pairs/s/chip)")


def ring_virtual8(n: int = 16384, iters: int = 8,
                  timeout: float = 900.0) -> dict:
    """Time the ring-sharded update on an 8-virtual-device CPU mesh in a
    subprocess (the in-process backend may already be TPU). A regression in
    parallel/sharding.py's ring loop moves this number round-over-round —
    before round 4 the driver artifact gated only the single-chip jnp path."""
    code = (
        "import json, time\n"
        # This image preimports jax at interpreter startup (sitecustomize),
        # so JAX_PLATFORMS/XLA_FLAGS in the child env are too late; backends
        # initialize lazily, so jax.config.update still wins (tests/conftest
        # does the same).
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        "import nbody_tpu as nb\n"
        "from nbody_tpu.parallel import ShardedWorld, make_mesh\n"
        f"scene = nb.make_galaxies({n}, 2, seed={SEED})\n"
        "mesh = make_mesh()\n"
        "sw = ShardedWorld(scene, mesh)\n"
        "sw.update(1.0, 2); sw.block_until_ready()\n"
        "t0 = time.perf_counter()\n"
        f"sw.update(1.0, {iters}); sw.block_until_ready()\n"
        f"us = (time.perf_counter() - t0) / {iters} * 1e6\n"
        "print(json.dumps({'us_per_step': us,\n"
        "                  'devices': int(mesh.devices.size),\n"
        "                  'force_backend': sw.force_backend,\n"
        f"                  'n': {n}}}))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout)
        if r.returncode != 0:
            return {"error": r.stderr.decode(errors="replace").strip()[-200:]}
        return json.loads(r.stdout.decode().strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        return {"error": f"timed out > {timeout:.0f}s"}


def run_primary(args) -> dict:
    n = args.n
    w = make_world(n)
    # default: whatever backend the framework itself would pick at this N
    # (the measured-crossover heuristic) — i.e. out-of-the-box performance
    backend = args.backend or w.default_backend
    args.backend = backend
    # best-of-repeats: the remote-device tunnel adds run-to-run jitter; the
    # minimum is the honest hardware number
    us = min(
        bench_world(w, backend, args.iters, args.warmup if r == 0 else 0)
        for r in range(args.repeats)
    )
    pairs = w.total_len * w.mass_len
    rate = pairs / (us / 1e6)
    log(f"primary: N={n} mass_len={w.mass_len} padded={w.n_pad}x{w.src_len} "
        f"backend={args.backend} best-of-{args.repeats} {us:.1f} µs/step {rate:.3e} pairs/s")
    result = {
        "metric": f"pair_interactions_per_sec_per_chip_n{n}",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / 1e11,
        "primary_backend": backend,
        "primary_us_per_step": us,
    }
    if not args.no_kernel_gates:
        # Gate the Pallas kernel in the driver artifact too (the primary may
        # resolve to jnp): a kernel regression becomes visible in
        # BENCH_r{N}.json round-over-round, like bench.c:25-35 measuring
        # both reference backends.
        if backend == "pallas":
            pus = us
        else:
            reps = max(2, args.repeats // 2)
            pus = min(
                bench_world(w, "pallas", args.iters,
                            args.warmup if r == 0 else 0)
                for r in range(reps)
            )
        result["pallas_us_per_step"] = pus
        result["pallas_pairs_per_sec"] = pairs / (pus / 1e6)
        log(f"pallas kernel: {pus:.1f} µs/step "
            f"{result['pallas_pairs_per_sec']:.3e} pairs/s")
        if backend != "pallas" and pus < result["primary_us_per_step"]:
            # Tripwire (round-4 VERDICT task 7): PALLAS_CROSSOVER_N = None
            # (pallas never preferred) is backed by a complete ablation on
            # TODAY'S jaxlib (DESIGN.md §3) — but the conclusion is
            # jaxlib-version-dependent. The kernel beating the primary in a
            # round's gate means the crossover must be re-measured.
            result["revisit_pallas_crossover"] = True
            log("NOTE: pallas beat the primary backend this round — "
                "re-measure world.PALLAS_CROSSOVER_N (DESIGN.md §3 tripwire)")
        ring = ring_virtual8()
        result["ring_virtual8"] = ring
        log(f"ring virtual-8: {ring}")
    # Grid-backend gates (round-4 VERDICT task 4): p3m/pm are what
    # `auto` actually selects above AUTO_P3M_MIN_PAIRS; without a
    # driver-visible number a CIC/FFT/PP perf regression is silent.
    # Measured at the auto-selected regime (N=262144, BASELINE.json's
    # sharded-config size, on however many chips are present — one
    # here), like bench.c:25-35 measuring every backend it ships.
    # Controlled ONLY by --grid-gate-n (0 disables) — independent of
    # --no-kernel-gates, which covers the pallas/ring records.
    gn = args.grid_gate_n
    if gn:
        gw = make_world(gn)
        for gb in ("p3m", "pm"):
            gus = min(bench_world(gw, gb, iters=20,
                                  warmup=3 if r == 0 else 0)
                      for r in range(2))
            result[f"{gb}_us_per_step_n{gn}"] = gus
            log(f"{gb} @ N={gn}: {gus:.1f} µs/step "
                f"({gw.total_len * gw.mass_len / (gus / 1e6):.3e} "
                f"equivalent pairs/s)")
        del gw
    return result


def device_probe(timeout: float, attempts: int, interval: float = 60.0,
                 platform: str | None = None) -> bool:
    """True once a trivial jitted op completes on the backend the bench
    itself will use.

    Remote-attached devices (the v5e tunnel here) have wedge phases where
    even a 128-element matmul hangs indefinitely — which would hang this
    whole process at the first compile. Probe in a killable subprocess so a
    dead backend turns into a clean failure (TPU_STATUS_r03.md). The same
    guard protects the user-facing CLI via utils.check_device."""
    from nbody_tpu.utils.device_check import probe_device

    return probe_device(timeout, attempts, interval=interval,
                        platform=platform, log=log)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ladder", action="store_true", help="run the full N ladder (stderr table)")
    ap.add_argument("--extra", action="store_true", help="include 65k/262k/1M sizes in ladder")
    ap.add_argument("--max-n", type=int, default=10**9)
    ap.add_argument("--cpu", action="store_true", help="ladder: include jnp backend")
    ap.add_argument("--gpu", action="store_true", help="ladder: include pallas backend")
    ap.add_argument("--n", type=int, default=65536, help="primary metric particle count")
    ap.add_argument("--iters", type=int, default=BENCH_ITER)
    ap.add_argument("--warmup", type=int, default=WARMUP_ITER)
    # the remote-TPU tunnel here jitters ±10% run-to-run; best-of-5 keeps the
    # primary metric near the hardware's actual rate (each repeat ~1s device
    # time at the default N)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--backend", default=None,
                    choices=["pallas", "jnp", "pallas_fused", "pm", "p3m"],
                    help="force a backend (default: the framework's own "
                         "size-based choice)")
    ap.add_argument("--sharded", action="store_true",
                    help="also time the ring-sharded world over all devices")
    ap.add_argument("--no-kernel-gates", action="store_true",
                    help="skip the pallas-kernel and virtual-8-ring gate "
                         "records in the primary JSON line")
    ap.add_argument("--grid-gate-n", type=int, default=262144,
                    help="N for the p3m/pm gate records in the primary "
                         "JSON line (the auto-selected grid regime); "
                         "0 disables")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the primary run "
                         "into DIR (view in TensorBoard/Perfetto)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) in-process; env "
                         "JAX_PLATFORMS is too late where a sitecustomize "
                         "presets the platform programmatically")
    args = ap.parse_args()
    if args.platform:
        # must precede the first device touch; jax is imported but no
        # backend is initialized yet
        jax.config.update("jax_platforms", args.platform)
    if not args.cpu and not args.gpu:
        args.gpu = True  # default: the flagship backend

    if os.environ.get("NBODY_BENCH_NO_PROBE") != "1":
        # generous timeout: on a loaded host even a CPU `import jax` can take
        # minutes; the probe exists to catch the *indefinite* wedge mode
        timeout = float(os.environ.get("NBODY_BENCH_PROBE_TIMEOUT", "240"))
        attempts = int(os.environ.get("NBODY_BENCH_PROBE_ATTEMPTS", "3"))
        if not device_probe(timeout, attempts, platform=args.platform):
            # Emit a well-formed record instead of hanging the caller at the
            # first compile; value 0 = no measurement (see TPU_STATUS_r03.md).
            print(json.dumps({
                "metric": f"pair_interactions_per_sec_per_chip_n{args.n}",
                "value": 0.0,
                "unit": "pairs/s",
                "vs_baseline": 0.0,
                "error": "device backend unreachable (probe hung/failed); "
                         "see TPU_STATUS_r03.md",
            }), flush=True)
            return

    if args.ladder:
        run_ladder(args)
    if args.sharded:
        run_sharded(args)
    if args.profile:
        from nbody_tpu.utils.profiling import trace

        with trace(args.profile):
            result = run_primary(args)
        log(f"profiler trace -> {args.profile}")
    else:
        result = run_primary(args)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
