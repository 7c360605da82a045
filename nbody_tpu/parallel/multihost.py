"""Multi-host (multi-process) operation: one simulation spanning TPU pods.

The reference is strictly single-node — no NCCL/MPI/sockets anywhere
(SURVEY.md §2 "Distributed communication backend: none"); single-host
multi-device sharding is already this framework's beyond-reference scaling
story (``parallel.sharding``). This module extends it across *processes*:
the controller-per-host JAX runtime (``jax.distributed``) where every host
sees the global device set and jitted computations run SPMD over one global
mesh, with collectives riding ICI within a slice and DCN across slices.

Usage (same script on every host, e.g. one per TPU VM)::

    from nbody_tpu.parallel import multihost
    multihost.initialize()                       # auto-detects on TPU pods
    scene = nb.make_galaxies(1_000_000, 3, seed=11037)   # deterministic,
    world = multihost.multihost_world(scene)             # same on all hosts
    world.update(0.01, 100)
    parts = multihost.gather_particles(world)    # replicated host copy

Design notes:
  * Scene synthesis is deterministic in the seed (numpy), so every process
    builds the same host scene and no scene broadcast is needed; only the
    process-local shard rows are ever transferred to local devices
    (``jax.make_array_from_callback`` pulls exactly the addressable
    index ranges).
  * The result is an ordinary :class:`~nbody_tpu.parallel.ShardedWorld`
    whose arrays are *global* jax.Arrays — ``update`` / ``record`` /
    checkpointing behave identically to the single-process mesh; Orbax
    checkpoints are multihost-native already (utils/checkpoint.py).
  * ``ShardedWorld.particles`` touches only addressable shards and is NOT
    meaningful under multiple processes — use :func:`gather_particles`.

CPU testing: the same code path runs as N processes x M local CPU devices
with Gloo collectives (tests/test_multihost.py), the multi-host analogue of
the 8-device virtual mesh the single-process tests use.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Particles, SimConfig, DEFAULT_SIM_CONFIG
from .sharding import AXIS, ShardedWorld, make_mesh, shard_layout

_INITIALIZED = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
    cpu_collectives: str | None = "gloo",
) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    On TPU pods all arguments auto-detect from the TPU metadata; on CPU (CI,
    tests) pass coordinator/num_processes/process_id explicitly and the
    cross-process collective backend is set to ``cpu_collectives`` first
    (must run before the CPU backend is touched)."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    if cpu_collectives is not None:
        # only meaningful for the CPU backend; harmless elsewhere. Applied
        # unconditionally (not only for explicit num_processes) so
        # auto-detected multi-process CPU launches (SLURM etc.) also get a
        # cross-process collective backend.
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def _padded_host_state(scene: Particles, n_pad: int):
    """Host-side mirror of world._create_padded_state (world.c:33-46
    semantics): stable massive-first partition + padding. Runs in numpy so
    no process ever materializes the scene on a single device."""
    pos = np.asarray(scene.pos, np.float32)
    vel = np.asarray(scene.vel, np.float32)
    acc = np.asarray(scene.acc, np.float32)
    mass = np.asarray(scene.mass, np.float32)
    radius = np.asarray(scene.radius, np.float32)
    n = pos.shape[0]
    order = np.argsort(mass <= 0, kind="stable")

    def pad(a, fill):
        out = np.full((n_pad,) + a.shape[1:], np.float32(fill))
        out[:n] = a[order]
        return out

    return pad(pos, 0.0), pad(vel, 0.0), pad(acc, 0.0), pad(mass, 0.0), \
        pad(radius, 1.0)


def multihost_world(
    scene: Particles,
    mesh: Mesh | None = None,
    *,
    config: SimConfig = DEFAULT_SIM_CONFIG,
    force_backend=None,
) -> ShardedWorld:
    """Create a ShardedWorld over the GLOBAL device set from a
    host-replicated scene (every process passes an identical ``scene``,
    e.g. the same seeded ``make_galaxies`` call).

    Each process uploads only the rows its local devices own. Works
    unchanged in a single process (then it is equivalent to
    ``ShardedWorld(scene, mesh)``)."""
    if mesh is None:
        mesh = make_mesh()  # jax.devices() is the global set under jax.distributed
    d = mesh.devices.size
    mass = np.asarray(scene.mass, np.float32)
    n = mass.shape[0]
    mass_len = int(np.count_nonzero(mass > 0.0))
    _, _, _, n_pad = shard_layout(n, mass_len, config, d)

    pos, vel, acc, mass_p, radius = _padded_host_state(scene, n_pad)
    sh = NamedSharding(mesh, P(AXIS))
    sh2 = NamedSharding(mesh, P(AXIS, None))

    def put(a, sharding):
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return ShardedWorld.from_arrays(
        put(pos, sh2), put(vel, sh2), put(acc, sh2),
        put(mass_p, sh), put(radius, sh),
        total_len=n, mass_len=mass_len, mesh=mesh,
        config=config, force_backend=force_backend,
    )


def gather_particles(world: ShardedWorld) -> Particles:
    """Full host copy of the (partitioned, trimmed) particle state,
    replicated to every process — the multi-process counterpart of
    ``ShardedWorld.particles`` (which only reads addressable shards)."""
    from jax.experimental import multihost_utils

    n = world.total_len
    # one pytree allgather (a single collective + host sync, not five)
    tree = multihost_utils.process_allgather(
        {"pos": world.pos, "vel": world.vel, "acc": world.acc,
         "mass": world.mass, "radius": world.radius}, tiled=True)
    host = {k: np.asarray(v)[:n] for k, v in tree.items()}
    return Particles(**host)
