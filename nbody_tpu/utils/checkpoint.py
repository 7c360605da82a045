"""State checkpoint / resume (.npz) and trajectory export.

The reference has no persistence at all (SURVEY.md §5: state lives only in
RAM/VRAM); this is the cheap superset needed anyway for golden-trajectory
parity tests.
"""

from __future__ import annotations

import numpy as np

from ..types import Particles, make_particles


def save_particles(path: str, particles: Particles, **extra) -> None:
    """Save particle state (+ optional metadata scalars) to an .npz file."""
    np.savez_compressed(
        path,
        pos=np.asarray(particles.pos),
        vel=np.asarray(particles.vel),
        acc=np.asarray(particles.acc),
        mass=np.asarray(particles.mass),
        radius=np.asarray(particles.radius),
        **extra,
    )


def load_particles(path: str) -> tuple[Particles, dict]:
    """Load particle state; returns (particles, extra_metadata)."""
    with np.load(path) as data:
        p = make_particles(
            data["pos"], vel=data["vel"], acc=data["acc"],
            mass=data["mass"], radius=data["radius"],
        )
        extra = {k: data[k] for k in data.files
                 if k not in ("pos", "vel", "acc", "mass", "radius")}
    return p, extra


def save_world(path: str, world, step: int = 0) -> None:
    """Checkpoint a World (single-chip or sharded): unpadded state +
    counters + the SimConfig (JSON string), so a resume can rebuild the
    same physics without the caller re-supplying save-time tuning."""
    save_particles(path, world.particles, step=np.int64(step),
                   mass_len=np.int64(world.mass_len),
                   sim_config=_config_json(world.config))


def _config_json(config) -> str:
    import dataclasses
    import json

    return json.dumps(dataclasses.asdict(config))


def save_world_atomic(path: str, world, step: int = 0) -> None:
    """Crash-safe checkpoint: write a temp .npz in the target directory,
    then atomically rename over ``path`` (POSIX rename) — a process killed
    mid-write can never leave a half-written file shadowing the previous
    good checkpoint. Used by the CLI's --checkpoint-every loop."""
    import os
    import tempfile

    target = os.path.abspath(path)
    fd, tmp = tempfile.mkstemp(
        suffix=".npz", prefix=".ckpt-", dir=os.path.dirname(target) or ".")
    os.close(fd)
    try:
        # mkstemp creates 0600; restore the umask-honoring mode a plain
        # open() would have produced (group-shared resume workflows)
        os.chmod(tmp, 0o666 & ~_current_umask())
        save_particles(tmp, world.particles, step=np.int64(step),
                       mass_len=np.int64(world.mass_len),
                       sim_config=_config_json(world.config))
        # flush file contents to disk before the rename becomes visible, so
        # a power loss (not just a SIGKILL) cannot expose a truncated target
        with open(tmp, "rb+") as f:
            os.fsync(f.fileno())
        os.replace(tmp, target)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _current_umask() -> int:
    import os

    mask = os.umask(0)
    os.umask(mask)
    return mask


def load_world(path: str, world_cls=None, **world_kwargs):
    """Resume a World from a checkpoint. Returns (world, step).

    When the checkpoint carries a SimConfig (save_world has recorded one
    since round 3) and no ``config=`` is passed, the saved one is used —
    a resume reproduces the save-time physics by default."""
    if world_cls is None:
        from ..world import World as world_cls  # noqa: N813
    p, extra = load_particles(path)
    if ("sim_config" in extra and "config" not in world_kwargs
            and _accepts_config(world_cls)):
        saved = saved_config(extra)
        if saved is not None:
            world_kwargs["config"] = saved
    return world_cls(p, **world_kwargs), int(extra.get("step", 0))


def saved_config(extra: dict):
    """SimConfig from load_particles metadata, or None (absent/corrupt)."""
    import json
    import warnings

    if "sim_config" not in extra:
        return None
    try:
        return config_from_dict(json.loads(str(np.asarray(
            extra["sim_config"]).item())))
    except Exception as e:
        warnings.warn(f"ignoring unreadable sim_config in checkpoint "
                      f"({type(e).__name__}: {e}); pass config= explicitly "
                      "to silence", stacklevel=3)
        return None


# --- Orbax-backed checkpointing (sharded-array native, async-capable) -----
#
# The .npz path above gathers state to the host, which is fine up to a few
# million particles. For pod-scale sharded worlds, Orbax writes each shard
# from its own device without a global gather, and the restore below reads
# each shard back to its own device (sharded abstract target) — no host
# gather in either direction.
#
# Layout: <path>/meta (scalars: step, total_len, mass_len, n_pad) and
# <path>/arrays (the PADDED device state: pos/vel/acc/mass/radius).

def _meta_tree(world, step: int) -> dict:
    return {
        "step": np.int64(step),
        "total_len": np.int64(world.total_len),
        "mass_len": np.int64(world.mass_len),
        "n_pad": np.int64(world.n_pad),
    }


def save_world_orbax(path: str, world, step: int = 0) -> None:
    """Checkpoint a World/ShardedWorld with Orbax (per-shard writes).

    Also records the world's ``SimConfig`` (``config.json`` sidecar) so a
    restore can rebuild the exact padded layout without the caller having
    to remember save-time tile/backend tuning."""
    import os

    import orbax.checkpoint as ocp

    state = world.state
    arrays = {
        "pos": state.pos, "vel": state.vel, "acc": state.acc,
        "mass": state.mass, "radius": state.radius,
    }
    base = os.path.abspath(path)
    _drop_config_sidecar(base)  # a crash mid-save must not leave NEW arrays
    with ocp.StandardCheckpointer() as ckpt:  # paired with a STALE config
        ckpt.save(os.path.join(base, "meta"), _meta_tree(world, step), force=True)
        ckpt.save(os.path.join(base, "arrays"), arrays, force=True)
    _save_config_sidecar(base, world.config)


def _drop_config_sidecar(base: str) -> None:
    import os

    import jax

    if jax.process_index() != 0:
        return
    try:
        os.unlink(os.path.join(base, "config.json"))
    except FileNotFoundError:
        pass


def _save_config_sidecar(base: str, config) -> None:
    """Write <base>/config.json (process 0 only under multi-process jax;
    atomic rename so readers never see a partial file)."""
    import dataclasses
    import json
    import os
    import tempfile

    import jax

    if jax.process_index() != 0:
        return
    payload = {"format": 1, "sim_config": dataclasses.asdict(config)}
    fd, tmp = tempfile.mkstemp(prefix=".config-", dir=base)
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, os.path.join(base, "config.json"))


def _load_config_sidecar(base: str):
    """SimConfig from <base>/config.json, or None for older checkpoints.

    A sidecar that cannot be parsed (truncated file, incompatible future
    format, values a different SimConfig version rejects) degrades to the
    pre-sidecar behavior — warn and return None — rather than making the
    checkpoint unloadable. Unknown-key tolerance: see config_from_dict."""
    import json
    import os
    import warnings

    sidecar = os.path.join(base, "config.json")
    try:
        with open(sidecar) as f:
            payload = json.load(f)
        return config_from_dict(payload["sim_config"])
    except FileNotFoundError:
        return None
    except Exception as e:  # corrupt/incompatible sidecar, not a hard error
        warnings.warn(f"ignoring unreadable checkpoint config sidecar "
                      f"{sidecar} ({type(e).__name__}: {e}); pass config= "
                      "explicitly to silence", stacklevel=3)
        return None


def config_from_dict(d: dict):
    """SimConfig from a saved field dict. Unknown keys (a future SimConfig
    field later removed, or a newer writer) are dropped with the remaining
    fields honored — layout-relevant fields have never been removed, and a
    wrong layout is caught by the n_pad check downstream."""
    import dataclasses

    from ..types import SimConfig

    known = {f.name for f in dataclasses.fields(SimConfig)}
    return SimConfig(**{k: v for k, v in d.items() if k in known})


def _restore_meta(ckpt, base):
    import os

    meta_dir = os.path.join(base, "meta")
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(
            f"{base} is not a meta+arrays Orbax checkpoint (round-2 layout)")
    import jax

    target = {k: jax.ShapeDtypeStruct((), np.int64)
              for k in ("step", "total_len", "mass_len", "n_pad")}
    return {k: int(v) for k, v in ckpt.restore(meta_dir, target).items()}


def _accepts_config(world_cls) -> bool:
    """Whether ``world_cls(particles, config=...)`` is valid — guards the
    sidecar injection for custom world classes without that kwarg."""
    import inspect

    try:
        params = inspect.signature(world_cls).parameters
    except (TypeError, ValueError):
        return False
    return "config" in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values())


def load_world_orbax(path: str, world_cls=None, **world_kwargs):
    """Resume a single-chip World from an Orbax checkpoint: (world, step).

    Restores to host and rebuilds through world creation — adequate for
    single-host scales. For a gather-free sharded restore use
    :func:`load_sharded_world_orbax`."""
    import os

    import orbax.checkpoint as ocp

    if world_cls is None:
        from ..world import World as world_cls  # noqa: N813
    base = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        try:
            meta = _restore_meta(ckpt, base)
            tree = ckpt.restore(os.path.join(base, "arrays"))
        except FileNotFoundError:
            # round-1 layout: one flat tree with scalars inline
            tree = ckpt.restore(base)
            meta = {k: int(tree[k]) for k in ("step", "total_len", "mass_len")}
    if "config" not in world_kwargs and _accepts_config(world_cls):
        saved = _load_config_sidecar(base)
        if saved is not None:
            world_kwargs["config"] = saved
    n = meta["total_len"]
    p = make_particles(
        tree["pos"][:n], vel=tree["vel"][:n], acc=tree["acc"][:n],
        mass=tree["mass"][:n], radius=tree["radius"][:n],
    )
    return world_cls(p, **world_kwargs), meta["step"]


def load_sharded_world_orbax(path: str, mesh, *, config=None, force_backend=None):
    """Resume a ShardedWorld with each device reading only its own shard.

    The restore target is an abstract pytree of ``jax.ShapeDtypeStruct`` with
    ``NamedSharding`` leaves, so Orbax loads every shard straight to its
    device — no host gather (the round-1 restore host-gathered; VERDICT weak
    #6). With ``config=None`` the save-time SimConfig is restored from the
    checkpoint's sidecar (older checkpoints: the default config); the mesh
    size and config must reproduce the save-time padded layout (checked
    against the checkpoint's n_pad). Returns (world, step).
    """
    import os

    import jax
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import AXIS, ShardedWorld, shard_layout
    from ..types import DEFAULT_SIM_CONFIG, DTYPE

    base = os.path.abspath(path)
    config = config or _load_config_sidecar(base) or DEFAULT_SIM_CONFIG
    with ocp.StandardCheckpointer() as ckpt:
        meta = _restore_meta(ckpt, base)
        n, mass_len = meta["total_len"], meta["mass_len"]
        d = mesh.devices.size
        _, _, _, n_pad = shard_layout(n, mass_len, config, d)
        if n_pad != meta["n_pad"]:
            raise ValueError(
                f"checkpoint was saved with padded size {meta['n_pad']}; this "
                f"mesh/config gives {n_pad} — restore with the same mesh size "
                "and tile config, or go through load_world_orbax (host path)")
        sh = NamedSharding(mesh, P(AXIS))
        sh2 = NamedSharding(mesh, P(AXIS, None))
        target = {
            "pos": jax.ShapeDtypeStruct((n_pad, 2), DTYPE, sharding=sh2),
            "vel": jax.ShapeDtypeStruct((n_pad, 2), DTYPE, sharding=sh2),
            "acc": jax.ShapeDtypeStruct((n_pad, 2), DTYPE, sharding=sh2),
            "mass": jax.ShapeDtypeStruct((n_pad,), DTYPE, sharding=sh),
            "radius": jax.ShapeDtypeStruct((n_pad,), DTYPE, sharding=sh),
        }
        arrays = ckpt.restore(os.path.join(base, "arrays"), target)
    world = ShardedWorld.from_arrays(
        arrays["pos"], arrays["vel"], arrays["acc"], arrays["mass"],
        arrays["radius"], total_len=n, mass_len=mass_len, mesh=mesh,
        config=config, force_backend=force_backend,
    )
    return world, meta["step"]
