"""Device-side trajectory recording: frames captured inside one jitted scan.

The reference viewer reads the whole particle array back every rendered frame
(main.c:237-250, a device->host copy per frame — its own TODO README.md:97).
Here a whole animation's worth of frames is produced by a single fused
``lax.scan``: `steps_per_frame` substeps per frame, positions captured
on-device, one host transfer at the end (or none, if the caller keeps the
stacked frames on device for rasterization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .types import Particles, SimConfig
from .world import World, _step


@functools.partial(
    jax.jit,
    static_argnames=("frames", "steps_per_frame", "src_len", "src_real",
                     "config", "backend", "extra_force", "capture"),
    donate_argnums=(0,),
)
def record_states(
    state: Particles,
    gm: jax.Array,
    valid: jax.Array,
    dt: jax.Array,
    *,
    frames: int,
    steps_per_frame: int,
    src_len: int,
    src_real: int | None = None,
    config: SimConfig,
    backend: str,
    extra_force=None,
    capture=None,
):
    """Run frames*steps_per_frame substeps; return
    (final_state, final_gm, frames_out) where frames_out stacks
    ``capture(state, gm)`` once per frame along a new leading axis
    (default capture: positions, so frames_out is (frames, N_pad, 2)).
    ``gm`` only changes under ``config.merge_collisions`` (absorbed
    sources go inert); it is returned in every branch so callers have
    one contract. ``capture`` must be a jit-traceable
    ``(Particles, gm) -> pytree``; like ``extra_force`` it is a static
    argument, so reuse one function object across calls to avoid
    recompiles."""
    cap = capture if capture is not None else (lambda st, gm_: st.pos)
    body = functools.partial(
        _step, gm=gm, valid=valid, dt=dt,
        src_len=src_len, src_real=src_real, config=config, backend=backend,
        interpret=None, extra_force=extra_force,
    )

    if config.merge_collisions:
        # the substep-then-merge body is shared with update_state_merging
        # (ONE definition; the update and capture paths cannot drift)
        from .world import merging_substep_fn

        sub = merging_substep_fn(valid, src_len=src_len, src_real=src_real,
                                 config=config, backend=backend,
                                 extra_force=extra_force)

        def frame_body(carry, _):
            carry = jax.lax.fori_loop(
                0, steps_per_frame, lambda _, c: sub(c, dt), carry)
            return carry, cap(*carry)

        (st, gm), traj = jax.lax.scan(frame_body, (state, gm), None,
                                      length=frames)
        return st, gm, traj

    if backend == "p3m":
        # Same frozen-bins loop as world.update_state (shared helpers): the
        # constant exact-core top_k hoists out of the capture entirely, and
        # the spatial bookkeeping rebuilds every p3m_rebin_interval substeps
        # GLOBALLY (bins carried across frames, rebuild gated on the global
        # substep index) rather than per frame.
        from .world import p3m_bins_builder, p3m_substep_loop

        bins_of = p3m_bins_builder(state, gm, valid, src_len=src_len,
                                   config=config)
        k = config.p3m_rebin_interval

        def frame_body(carry, f):
            st, bins = carry
            st, bins = p3m_substep_loop(
                st, bins, f * steps_per_frame, steps_per_frame, body,
                bins_of, k)
            return (st, bins), cap(st, gm)

        (st, _), traj = jax.lax.scan(
            frame_body, (state, bins_of(state)),
            jnp.arange(frames, dtype=jnp.int32))
        return st, gm, traj

    def frame_body(st, _):
        st = jax.lax.fori_loop(0, steps_per_frame, lambda _, s: body(s), st)
        return st, cap(st, gm)

    st, traj = jax.lax.scan(frame_body, state, None, length=frames)
    return st, gm, traj


def record_trajectory(
    world: World,
    dt: float,
    frames: int,
    steps_per_frame: int = 1,
    backend: str | None = None,
    extra_force=None,
) -> np.ndarray:
    """Advance `world` by frames*steps_per_frame substeps, returning captured
    positions as host (frames, total_len, 2). The world's state is updated.
    ``extra_force(pos, vel) -> acc`` composes a user field with self-gravity
    inside the capture scan (same contract as World.update's hook)."""
    from .world import effective_src_len, resolve_backend

    backend = resolve_backend(
        backend or world.default_backend, world.total_len, world.mass_len,
        merging=world.config.merge_collisions,
        rebin_interval=world.config.p3m_rebin_interval)

    state, gm, traj = record_states(
        world.state, world.gm, world.valid, jnp.float32(dt),
        frames=frames, steps_per_frame=steps_per_frame,
        src_len=effective_src_len(backend, world.src_len, world.mass_len),
        src_real=world.mass_len,
        config=world.config, backend=backend, extra_force=extra_force,
    )
    world.state = state
    world.gm = gm
    world._host_cache = None
    return np.asarray(traj[:, : world.total_len, :])


def record_observables(
    world: World,
    dt: float,
    frames: int,
    steps_per_frame: int = 1,
    backend: str | None = None,
    extra_force=None,
    energy: str | None = "exact",
    capture=None,
    **capture_kw,
) -> dict:
    """Advance `world` by frames*steps_per_frame substeps, streaming
    conserved-quantity time series out of ONE jitted scan: per frame the
    host receives a handful of scalars (kinetic/potential energy, momentum,
    angular momentum, center of mass) instead of an (N, 2) position frame —
    the O(1)-per-frame companion to :func:`record_trajectory` for
    long-horizon drift monitoring at large N. ``energy`` picks the
    potential estimator (``"exact"`` pair sum / ``"pm"`` mesh / ``None``);
    a custom ``capture(state, gm) -> pytree`` overrides the default set
    entirely (see :func:`nbody_tpu.diagnostics.observables_capture`).
    Returns host numpy arrays keyed by observable, plus ``"time"``
    (the simulation time at each captured frame, starting after the first
    frame's substeps). The world's state is updated.

    ``energy`` / ``**capture_kw`` configure the default observable set and
    are rejected alongside a custom ``capture`` (which replaces that set
    entirely). The default capture is cached per settings
    (``diagnostics.observables_capture`` is lru_cached), so repeated calls
    hit the same compiled scan."""
    from .diagnostics import (
        check_observables_args,
        observables_capture,
        observables_series_out,
    )
    from .world import effective_src_len, resolve_backend

    check_observables_args(capture, energy, capture_kw)
    backend = resolve_backend(
        backend or world.default_backend, world.total_len, world.mass_len,
        merging=world.config.merge_collisions,
        rebin_interval=world.config.p3m_rebin_interval)
    if capture is None:
        capture = observables_capture(world.mass_len, energy=energy,
                                      **capture_kw)

    state, gm, series = record_states(
        world.state, world.gm, world.valid, jnp.float32(dt),
        frames=frames, steps_per_frame=steps_per_frame,
        src_len=effective_src_len(backend, world.src_len, world.mass_len),
        src_real=world.mass_len,
        config=world.config, backend=backend, extra_force=extra_force,
        capture=capture,
    )
    world.state = state
    world.gm = gm
    world._host_cache = None
    return observables_series_out(series, frames, steps_per_frame, dt)


def record_trajectory_sharded(
    world, dt: float, frames: int, steps_per_frame: int = 1, extra_force=None
) -> np.ndarray:
    """Trajectory capture for a ShardedWorld: all frames are captured inside
    ONE jitted scan on device (stacked sharded along the particle axis) and
    gathered to the host once at the end — same contract as the single-chip
    :func:`record_trajectory`. Delegates to :meth:`ShardedWorld.record`."""
    return world.record(dt, frames, steps_per_frame, extra_force=extra_force)


def save_trajectory(path: str, traj: np.ndarray, **extra) -> None:
    np.savez_compressed(path, traj=np.asarray(traj, np.float32), **extra)


def load_trajectory(path: str) -> tuple[np.ndarray, dict]:
    with np.load(path) as data:
        traj = data["traj"]
        extra = {k: data[k] for k in data.files if k != "traj"}
    return traj, extra
