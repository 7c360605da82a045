"""Subprocess worker for tests/test_multihost.py.

Runs as one of N cooperating processes (argv: proc_id nprocs port outdir),
each with 4 local virtual CPU devices, joined into one global 4N-device
mesh via jax.distributed + Gloo collectives — the CPU stand-in for a
multi-host TPU pod (one process per TPU VM).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    # Force CPU before any backend initialization (the axon sitecustomize
    # preimports jax, so env vars are too late; config updates still win).
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from nbody_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs          # global
    assert len(jax.local_devices()) == 4             # per-process

    import numpy as np
    import nbody_tpu as nb

    # Deterministic in the seed -> identical on every process (no broadcast).
    scene = nb.make_galaxies(1536, 2, seed=7)
    world = multihost.multihost_world(scene)
    world.update(0.005, 10)
    # collective adaptive stepping across processes: the criterion's min
    # reduces over the whole global mesh, so every process must take the
    # identical substep count
    k_adaptive = world.update_adaptive(0.01, dt_max=0.005)
    parts = multihost.gather_particles(world)

    # Orbax is multi-process-native: every process writes only its own
    # shards (shared filesystem). The test restores this on a
    # single-process mesh — checkpoint/resume across process counts.
    from nbody_tpu.utils.checkpoint import save_world_orbax
    save_world_orbax(f"{outdir}/orbax_ckpt", world, step=10)

    np.savez(f"{outdir}/proc{proc_id}.npz",
             pos=parts.pos, vel=parts.vel, mass=parts.mass,
             k_adaptive=np.int64(k_adaptive))


if __name__ == "__main__":
    main()
