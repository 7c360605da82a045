"""Multi-process (multi-host) operation: parallel/multihost.py.

The real deployment is one process per TPU VM over a pod slice; here the
same code path runs as 2 cooperating CPU processes with 4 virtual devices
each, joined into one 8-device global mesh via jax.distributed + Gloo
collectives (tests/multihost_worker.py) — the multi-process analogue of the
single-process 8-device mesh every other test uses. The reference is
strictly single-node (SURVEY.md §2: no distributed backend), so this whole
surface is beyond-reference scaling story.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import nbody_tpu as nb
from nbody_tpu.parallel import ShardedWorld, make_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")

# Must mirror tests/multihost_worker.py exactly.
N, GALAXIES, SEED, DT, SUBSTEPS = 1536, 2, 7, 0.005, 10


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    """Run the 2-process job once; several tests assert on its outputs.

    Two attempts: _free_port closes the socket before the coordinator
    rebinds it, so another process can steal the port in between (TOCTOU);
    a coordinator bind failure is retried on a fresh port."""
    last_logs = ""
    for attempt in range(2):
        outdir = tmp_path_factory.mktemp(f"multihost{attempt}")
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(i), "2", str(port), str(outdir)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=REPO,
            )
            for i in (0, 1)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multihost worker hung (coordinator handshake "
                            "or collective deadlock)")
            logs.append(out)
        if all(p.returncode == 0 for p in procs):
            return outdir, [np.load(os.path.join(outdir, f"proc{i}.npz"))
                            for i in (0, 1)]
        last_logs = "\n".join(logs)
    pytest.fail(f"multihost workers failed twice:\n{last_logs[-2000:]}")


def test_processes_agree(worker_outputs):
    """gather_particles replicates the identical global state to every
    process (process_allgather is deterministic)."""
    _, (a, b) = worker_outputs
    for key in ("pos", "vel", "mass"):
        np.testing.assert_array_equal(a[key], b[key])
    # both processes took the identical adaptive substep count (the dt
    # criterion's min is a cross-process collective)
    assert int(a["k_adaptive"]) == int(b["k_adaptive"]) >= 2


def test_matches_single_process_mesh(worker_outputs):
    """2 procs x 4 local devices must equal the single-process 8-device
    mesh: shard_layout depends only on (n, mass_len, config, D), so the
    per-device work — and hence the arithmetic — is identical; only the
    collective transport (Gloo vs in-process) differs."""
    _, (a, _) = worker_outputs
    scene = nb.make_galaxies(N, GALAXIES, seed=SEED)
    sw = ShardedWorld(scene, make_mesh())
    assert sw.n_devices == 8
    sw.update(DT, SUBSTEPS)
    # the workers also ran the collective adaptive span; mirror it. A 1-ulp
    # criterion difference (Gloo vs in-process reduction order) can shift
    # the count by one at a clip boundary — same ±1 convention as the other
    # adaptive parity tests
    k = sw.update_adaptive(0.01, dt_max=0.005)
    assert abs(k - int(a["k_adaptive"])) <= 1
    if k != int(a["k_adaptive"]):
        pytest.skip("adaptive substep counts differ by one (ulp-boundary "
                    "dt flip); position comparison not meaningful")
    ref = sw.particles
    np.testing.assert_allclose(a["mass"], ref.mass, rtol=0)
    np.testing.assert_allclose(a["pos"], ref.pos, rtol=0, atol=1e-5)
    np.testing.assert_allclose(a["vel"], ref.vel, rtol=0, atol=1e-5)


def test_orbax_restore_across_process_counts(worker_outputs):
    """The 2-process run's Orbax checkpoint (each process wrote only its
    own shards) restores on a single-process 8-device mesh and keeps
    running — checkpoint/resume across process counts, the multi-host
    extension of the pod-resize recipe in test_checkpoint.py."""
    from nbody_tpu.utils.checkpoint import load_sharded_world_orbax

    outdir, (a, _) = worker_outputs
    w, step = load_sharded_world_orbax(
        os.path.join(outdir, "orbax_ckpt"), make_mesh())
    assert step == SUBSTEPS
    parts = w.particles
    np.testing.assert_allclose(parts.pos, a["pos"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(parts.vel, a["vel"], rtol=0, atol=1e-6)
    w.update(DT, 1)  # restored world is live
    assert np.isfinite(w.particles.pos).all()


def test_single_process_equivalence():
    """In one process, multihost_world degenerates to ShardedWorld on the
    same mesh — same layout, same trajectories (no jax.distributed init
    needed on the already-initialized in-process backend)."""
    from nbody_tpu.parallel import multihost

    scene = nb.make_galaxies(N, GALAXIES, seed=SEED)
    mesh = make_mesh()
    w = multihost.multihost_world(scene, mesh)
    ref = ShardedWorld(scene, mesh)
    assert (w.s_loc, w.t_loc, w.src_len, w.n_pad) == \
        (ref.s_loc, ref.t_loc, ref.src_len, ref.n_pad)
    w.update(DT, SUBSTEPS)
    ref.update(DT, SUBSTEPS)
    gathered = multihost.gather_particles(w)
    np.testing.assert_allclose(gathered.pos, ref.particles.pos,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(gathered.vel, ref.particles.vel,
                               rtol=0, atol=1e-6)
