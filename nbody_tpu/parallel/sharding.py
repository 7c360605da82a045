"""Multi-chip particle-space sharding: ring all-gather of source tiles.

The reference is single-device (no NCCL/MPI anywhere — SURVEY.md §2); this
module is the new framework's scaling story, mandated by BASELINE.json
("large N shards across a TPU mesh via ring all-gather of particle tiles").

Design — the N-body analogue of ring attention / context parallelism:
  * particles are sharded along N over a 1-D ``jax.sharding.Mesh`` axis;
  * each device keeps its target shard resident and accumulates acceleration
    over D hops; at each hop the *source* tile (pos x/y + G*mass of the
    massive prefix shard) rotates one step around the ICI ring via
    ``jax.lax.ppermute`` while the local force kernel runs — compute and
    communication overlap under XLA's async collectives;
  * after the last hop, each shard integrates locally (embarrassingly
    parallel). No O(N^2) anything is ever materialized, and per-step
    communication is O(N_sources), independent of the O(N^2/D) compute.

The same code path runs on a real TPU pod slice and on a CPU "fake mesh"
(``--xla_force_host_platform_device_count``), which is how tests exercise it.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import forces, integrators
from ..ops.pallas_forces import (
    SOURCE_ALIGN,
    pallas_acc,
)
from ..types import Particles, SimConfig, DEFAULT_SIM_CONFIG, round_up

AXIS = "shard"


def shard_layout(n: int, mass_len: int, config: SimConfig, d: int):
    """Padded layout for a D-way sharded world: returns
    (s_loc, t_loc, src_len, n_pad). Deterministic in (n, mass_len, config,
    d), which is what lets a checkpoint restore rebuild the exact sharded
    shapes without touching the arrays."""
    s_loc = round_up(max(mass_len, 1), SOURCE_ALIGN * d) // d
    if s_loc > config.tile_sources:
        # chunk alignment also satisfies the local kernel's streaming mode
        # (per-shard sources beyond the VMEM residency budget): the kernel
        # sizes its own stream blocks and never needs block-level padding
        s_loc = round_up(s_loc, config.tile_sources)
    src_len = s_loc * d
    t_loc = round_up(max(n, src_len), 8 * d) // d
    if t_loc > config.tile_targets:
        t_loc = round_up(t_loc, config.tile_targets)
    return s_loc, t_loc, src_len, t_loc * d


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the particle axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _local_acc(
    tgt_pos, tgt_radius, src_pos, src_gm, *, config: SimConfig, force_backend: str
):
    """Force of one visiting source tile on the local target shard."""
    if force_backend == "pallas":
        return pallas_acc(
            tgt_pos, tgt_radius, src_pos, src_gm,
            tile_targets=config.tile_targets,
            tile_sources=config.tile_sources,
            precise=config.precise,
        )
    chunk = min(config.tile_targets, tgt_pos.shape[0])
    return forces.direct_sum_acc(
        tgt_pos, tgt_radius, src_pos, src_gm, chunk=chunk, precise=config.precise
    )


def _fused_ring_step_shard(
    pos, vel, radius, gm_src, src_pos0, valid, dt,
    *, n_devices: int, config: SimConfig, pos_dt: float = 1.0,
):
    """Fully fused substep: force + ring RDMA + integration in ONE Pallas
    kernel per device (nbody_tpu.ops.ring_forces). The comm/compute overlap
    is inside the kernel rather than left to XLA. ``pos_dt=0.5`` turns the
    in-kernel integration into the kick + half-drift second half of
    position-Verlet (the caller pre-drifts positions by dt/2)."""
    from ..ops.ring_forces import ring_substep

    src = jnp.stack([src_pos0[:, 0], src_pos0[:, 1], gm_src], axis=0)
    return ring_substep(
        dt, pos, vel, radius, valid, src,
        axis=AXIS, n_devices=n_devices,
        tile_t=config.tile_targets, tile_s=config.tile_sources,
        precise=config.precise, pos_dt=pos_dt,
    )


def _pm_force_shard(pos, radius, gm_row, valid, *, config: SimConfig):
    """Masked acceleration via the collective particle-mesh solve (one psum
    of the (G, G) mass grid over the mesh per evaluation; see
    ops/pm_forces.pm_acc_collective). CIC scatter is order-independent, so
    each device scatters its OWN resident target rows weighted by the
    per-row ``gm_row`` (zero for massless/padding) — no per-substep source
    reshard at all; the only communication is the fixed O(G^2) psum.
    ``radius`` is unused — PM softening is the global
    ``config.pm_softening``."""
    from ..ops.pm_forces import pm_acc_collective

    del radius
    acc = pm_acc_collective(
        pos, pos, gm_row, softening=config.pm_softening,
        grid=config.pm_grid, tgt_mask=valid, axis_name=AXIS)
    return acc * valid


def _grid_device_loop(pos, vel, acc, radius, gm_row, valid, dt, n, *,
                      config: SimConfig, force_backend: str, d: int,
                      extra_force=None):
    """Per-device body for the grid backends (pm / p3m): the WHOLE
    n-substep loop runs inside one ``shard_map`` call (collectives inside
    ``fori_loop`` are fine), which lets p3m carry its frozen collective
    bins across substeps — enabling ``p3m_rebin_interval`` on meshes and
    hoisting the position-independent exact-core selection out of the
    loop. Integrators (Euler / position-Verlet / yoshida4 DKD stages,
    integrators.advance) run per device."""
    def hooked(force, vel):
        # user field composed per shard (the hook must be a pointwise
        # function of (pos, vel): it sees LOCAL rows); vel = substep entry
        if extra_force is None:
            return force
        return lambda p: (force(p)
                          + forces.checked_extra_acc(extra_force, p, vel)
                          * valid)

    if force_backend == "pm":
        def force(p):
            return _pm_force_shard(p, radius, gm_row, valid, config=config)

        def body(_, carry):
            pos, vel, acc = carry
            return integrators.advance(config.integrator, hooked(force, vel),
                                       pos, vel, dt)

        return jax.lax.fori_loop(0, n, body, (pos, vel, acc))

    from ..ops.p3m_forces import (
        p3m_acc_collective_from_bins, p3m_bins_collective,
        p3m_exact_core_bins_collective)

    kw = dict(grid=config.pm_grid, rc_cells=config.p3m_rc_cells,
              cell_capacity=config.p3m_cell_capacity,
              exact_targets=config.p3m_exact_targets,
              axis_name=AXIS, n_devices=d)
    big0 = (p3m_exact_core_bins_collective(
        radius, exact_targets=config.p3m_exact_targets,
        axis_name=AXIS, n_devices=d, tgt_mask=valid)
        if config.p3m_exact_targets else None)

    def bins_of(p):
        return p3m_bins_collective(p, radius, gm_row, tgt_mask=valid,
                                   big_bins=big0,
                                   composite=config.p3m_rebin_interval > 1,
                                   **kw)

    def force(bins, p):
        return p3m_acc_collective_from_bins(
            bins, p, radius, gm_row, softening=config.pm_softening,
            precise=config.precise,
            pp_chunk=config.p3m_pp_chunk or None,
            pp_compact=config.p3m_pp_compact or None, **kw) * valid

    k = config.p3m_rebin_interval

    def substep(bins, carry):
        pos, vel, acc = carry
        return integrators.advance(
            config.integrator, hooked(lambda p: force(bins, p), vel),
            pos, vel, dt)

    if k == 1:
        def body(_, carry):
            pos, vel, acc = carry
            return substep(bins_of(pos), (pos, vel, acc))

        return jax.lax.fori_loop(0, n, body, (pos, vel, acc))

    # Rebin chunks as a NESTED loop, never a lax.cond: a cond whose
    # branches contain collectives deadlocks under shard_map (devices pair
    # mismatched collective op_ids across the branches — observed as an
    # XLA rendezvous termination on the CPU mesh). The outer loop
    # recomputes bins unconditionally every k substeps; the inner loop
    # reuses them. Trip counts are identical on every device.
    n_chunks = (n + k - 1) // k

    def chunk(c, carry):
        pos, vel, acc = carry
        bins = bins_of(pos)
        m = jnp.minimum(k, n - c * k)
        return jax.lax.fori_loop(
            0, m, lambda _, cr: substep(bins, cr), (pos, vel, acc))

    return jax.lax.fori_loop(0, n_chunks, chunk, (pos, vel, acc))


def _ring_force_shard(
    pos, radius, gm_src, src_pos0, valid,
    *, n_devices: int, config: SimConfig, force_backend: str
):
    """Masked acceleration of the full ring pass (no integration)."""
    acc = jnp.zeros_like(pos)
    src_pos, src_gm = src_pos0, gm_src
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
    for hop in range(n_devices):
        if hop < n_devices - 1:
            next_pos = jax.lax.ppermute(src_pos, AXIS, perm)
            next_gm = jax.lax.ppermute(src_gm, AXIS, perm)
        acc = acc + _local_acc(
            pos, radius, src_pos, src_gm,
            config=config, force_backend=force_backend,
        )
        if hop < n_devices - 1:
            src_pos, src_gm = next_pos, next_gm
    return acc * valid


def _ring_step_shard(
    pos, vel, radius, gm_src, src_pos0, valid, dt,
    *, n_devices: int, config: SimConfig, force_backend: str
):
    """Body run per device under shard_map: one substep.

    Args (all *local* shards):
      pos, vel: (n_loc, 2) targets.  radius: (n_loc,).
      gm_src: (s_loc,) G*mass of this device's source shard (zero-padded).
      src_pos0: (s_loc, 2) this device's source shard positions (a prefix
        gather of the massive partition; kept consistent with pos by the
        caller each substep).
      valid: (n_loc, 1) 1.0 for real particles.
    """
    acc = jnp.zeros_like(pos)
    src_pos, src_gm = src_pos0, gm_src

    # D hops: compute on the resident tile, rotate it to the right neighbor.
    # ppermute is issued before the compute so XLA can overlap the transfer
    # with the force kernel of the current hop.
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
    for hop in range(n_devices):
        if hop < n_devices - 1:
            next_pos = jax.lax.ppermute(src_pos, AXIS, perm)
            next_gm = jax.lax.ppermute(src_gm, AXIS, perm)
        acc = acc + _local_acc(
            pos, radius, src_pos, src_gm,
            config=config, force_backend=force_backend,
        )
        if hop < n_devices - 1:
            src_pos, src_gm = next_pos, next_gm

    acc = acc * valid
    vel = vel + dt * acc
    pos = pos + dt * vel
    return pos, vel, acc


def _adaptive_while(one, pos, vel, acc, radius, t_span, eta, dt_min, dt_max):
    """Sharded analogue of :func:`nbody_tpu.world.update_state_adaptive`'s
    loop. ``one(pos, vel, acc, dt)`` performs a single substep on the global
    (sharded) arrays; the softening-resolution criterion reduces over the
    global acc/radius, so XLA inserts the cross-device min — every shard
    agrees on each dt by construction. Padding rows are inert: their acc is
    masked to zero by ``valid`` inside the force shards and zero acc maps to
    an infinite per-row timescale."""
    from ..diagnostics import next_adaptive_dt

    # prime acc (dt = 0: nothing moves, acc stored)
    pos, vel, acc = one(pos, vel, acc, jnp.float32(0.0))

    def cond(carry):
        return carry[3] < t_span

    def body(carry):
        pos, vel, acc, t, k = carry
        dt = next_adaptive_dt(acc, radius, eta=eta, dt_min=dt_min,
                              dt_max=dt_max, t=t, t_span=t_span)
        pos, vel, acc = one(pos, vel, acc, dt)
        return pos, vel, acc, t + dt, k + 1

    pos, vel, acc, _, k = jax.lax.while_loop(
        cond, body, (pos, vel, acc, jnp.float32(0.0), jnp.int32(0)))
    return pos, vel, acc, k


def _pos_capture(st, gm):
    """Default per-frame capture: positions (trajectory recording)."""
    del gm
    return st.pos


def _build_merging_fns(mstep):
    """Jitted (update, adaptive, record) triple for a merging world, built
    from ``mstep(pos, vel, acc, radius, mass, gm, valid, dt)`` — the
    substep-then-merge body. Unlike the non-merging fns, radius/mass/gm are
    loop CARRIES (a merge rewrites them), mirroring
    ``world.update_state_merging``. The merge pass itself runs at the jit
    level on the global sharded arrays; GSPMD partitions the chunked O(M²)
    contact pass and inserts the gathers it needs."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def update(pos, vel, acc, radius, mass, gm, valid, dt, n):
        def body(_, c):
            return mstep(*c, valid, dt)

        return jax.lax.fori_loop(0, n, body,
                                 (pos, vel, acc, radius, mass, gm))

    @functools.partial(jax.jit,
                       static_argnames=("frames", "steps", "capture"),
                       donate_argnums=(0, 1, 2, 3, 4, 5))
    def record(pos, vel, acc, radius, mass, gm, valid, dt, *, frames, steps,
               capture=None):
        cap = capture if capture is not None else _pos_capture

        def frame_body(c, _):
            c = jax.lax.fori_loop(
                0, steps, lambda _, cc: mstep(*cc, valid, dt), c)
            st = Particles(pos=c[0], vel=c[1], acc=c[2], mass=c[4],
                           radius=c[3])
            return c, cap(st, c[5])

        return jax.lax.scan(frame_body, (pos, vel, acc, radius, mass, gm),
                            None, length=frames)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def adaptive(pos, vel, acc, radius, mass, gm, valid,
                 t_span, eta, dt_min, dt_max):
        # prime acc (dt = 0; the merge in the priming substep also resolves
        # bodies that already overlap at entry, like the single-chip path)
        from ..diagnostics import next_adaptive_dt

        c = mstep(pos, vel, acc, radius, mass, gm, valid, jnp.float32(0.0))

        def cond(carry):
            return carry[1] < t_span

        def body(carry):
            c, t, k = carry
            # c[2]/c[3] = acc / radius (radius changes through merges)
            dt = next_adaptive_dt(c[2], c[3], eta=eta, dt_min=dt_min,
                                  dt_max=dt_max, t=t, t_span=t_span)
            return mstep(*c, valid, dt), t + dt, k + 1

        c, _, k = jax.lax.while_loop(
            cond, body, (c, jnp.float32(0.0), jnp.int32(0)))
        return c + (k,)

    return update, adaptive, record


def _default_force_backend(force_backend, total_len, mass_len, d,
                           merging=False):
    if force_backend is None:
        force_backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    elif force_backend == "auto":
        # Per-chip mux (world.resolve_backend is the single-chip form):
        # direct-sum pair work total*mass_len splits evenly over the ring,
        # while the grid backends' fixed mesh cost replicates per device —
        # so the measured single-chip crossover applies to the PER-CHIP
        # pair count, and a D-mesh switches to p3m D× later in N².
        # A merging world picks pm above the crossover (p3m's frozen gm
        # cell blocks would go stale through a merge, same as single-chip).
        from ..world import AUTO_P3M_MIN_PAIRS
        per_chip = (total_len * mass_len) // max(d, 1)
        far = "pm" if merging else "p3m"
        force_backend = "jnp" if per_chip <= AUTO_P3M_MIN_PAIRS else far
    elif force_backend not in ("jnp", "pallas", "pallas_ring", "pm", "p3m"):
        raise ValueError(
            f"unknown force_backend {force_backend!r}; expected 'jnp', "
            "'pallas', 'pallas_ring', 'pm', 'p3m', or 'auto'")
    if merging and force_backend == "p3m":
        raise ValueError(
            "merge_collisions is not supported with force_backend='p3m' "
            "(frozen cell blocks); use 'jnp', 'pallas', 'pallas_ring', "
            "or 'pm'")
    return force_backend


class ShardedWorld:
    """Multi-device World: particles sharded over a 1-D mesh.

    Mirrors the single-chip :class:`nbody_tpu.world.World` API (update /
    particles), with the force computed by the ppermute ring above.

    Layout invariants:
      * global padded particle count ``n_pad`` divisible by ``D``;
      * source row (massive prefix, zero-padded) length ``src_len`` divisible
        by ``D`` and each source shard aligned to SOURCE_ALIGN lanes;
      * each device's source shard is a slice of the *global* massive prefix,
        so rotating all D shards around the ring covers exactly the
        ``mass_len`` force-exerting particles (quirk #3 preserved).
    """

    def __init__(
        self,
        particles: Particles,
        mesh: Mesh | None = None,
        *,
        config: SimConfig = DEFAULT_SIM_CONFIG,
        force_backend: Literal["jnp", "pallas", "pallas_ring", "pm", "p3m",
                               "auto"] | None = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        d = self.mesh.devices.size
        self.n_devices = d
        self.config = config

        from ..types import DTYPE
        from ..world import _create_padded_state

        pos0 = jnp.asarray(particles.pos, DTYPE)
        vel0 = jnp.asarray(particles.vel, DTYPE)
        acc0 = jnp.asarray(particles.acc, DTYPE)
        mass0 = jnp.asarray(particles.mass, DTYPE)
        radius0 = jnp.asarray(particles.radius, DTYPE)
        n = pos0.shape[0]
        # the only device->host transfer at creation: one scalar
        mass_len = int(jax.device_get(jnp.count_nonzero(mass0 > 0.0)))
        self.force_backend = force_backend = _default_force_backend(
            force_backend, n, mass_len, d, merging=config.merge_collisions)

        s_loc, t_loc, src_len, n_pad = shard_layout(n, mass_len, config, d)

        self.total_len = n
        self.mass_len = mass_len
        self.src_len = src_len
        self.n_pad = n_pad
        self.t_loc = t_loc
        self.s_loc = s_loc

        # device-side partition/pad (no host round trip), then scatter the
        # padded arrays across the mesh (device->device)
        state, gm_full, valid = _create_padded_state(
            pos0, vel0, acc0, mass0, radius0, jnp.int32(mass_len),
            n_pad=n_pad, g=config.g,
        )
        sh = NamedSharding(self.mesh, P(AXIS))
        sh2 = NamedSharding(self.mesh, P(AXIS, None))
        self.pos = jax.device_put(state.pos, sh2)
        self.vel = jax.device_put(state.vel, sh2)
        self.acc = jax.device_put(state.acc, sh2)
        self.mass = jax.device_put(state.mass, sh)
        self.radius = jax.device_put(state.radius, sh)
        # gm rows: ring backends take the massive-prefix slice resharded so
        # each device owns s_loc of it; pm takes the FULL per-target gm row
        # (sharded like pos) so it never reshards sources
        if force_backend in ("pm", "p3m"):
            self.gm_src = jax.device_put(gm_full, sh)
        else:
            self.gm_src = jax.device_put(gm_full[:src_len], sh)
        self.valid = jax.device_put(valid, sh2)
        (self._update_fn, self._adaptive_fn,
         self._record_fn) = self._build_update()
        self._hooked_key = self._hooked_fn = None
        self._hooked_adaptive = self._hooked_record = None
        self._host_cache: Particles | None = None

    @classmethod
    def from_arrays(
        cls,
        pos, vel, acc, mass, radius,
        *,
        total_len: int,
        mass_len: int,
        mesh: Mesh,
        config: SimConfig = DEFAULT_SIM_CONFIG,
        force_backend=None,
    ) -> "ShardedWorld":
        """Rebuild a ShardedWorld around already-sharded PADDED arrays (e.g.
        restored in place by Orbax) without re-running creation. The arrays
        must match :func:`shard_layout` for (total_len, mass_len, config,
        mesh size); gm/valid rows are re-synthesized on device."""
        self = cls.__new__(cls)
        self.mesh = mesh
        d = mesh.devices.size
        self.n_devices = d
        self.config = config
        self.force_backend = force_backend = _default_force_backend(
            force_backend, total_len, mass_len, d,
            merging=config.merge_collisions)

        s_loc, t_loc, src_len, n_pad = shard_layout(total_len, mass_len, config, d)
        if pos.shape != (n_pad, 2):
            raise ValueError(
                f"restored pos shape {pos.shape} does not match the layout "
                f"for n={total_len}, mass_len={mass_len}, D={d}: ({n_pad}, 2) "
                "— restore with the same config and mesh size as the save")
        self.total_len = total_len
        self.mass_len = mass_len
        self.src_len = src_len
        self.n_pad = n_pad
        self.t_loc = t_loc
        self.s_loc = s_loc

        sh = NamedSharding(mesh, P(AXIS))
        sh2 = NamedSharding(mesh, P(AXIS, None))
        self.pos = jax.device_put(pos, sh2)
        self.vel = jax.device_put(vel, sh2)
        self.acc = jax.device_put(acc, sh2)
        self.mass = jax.device_put(mass, sh)
        self.radius = jax.device_put(radius, sh)

        @functools.partial(jax.jit, out_shardings=(sh, sh2))
        def synth(mass):
            idx = jnp.arange(n_pad)
            gm = jnp.where(idx < mass_len, config.g * mass, 0.0).astype(mass.dtype)
            valid = (idx < total_len).astype(mass.dtype)[:, None]
            gm_row = gm if force_backend in ("pm", "p3m") else gm[:src_len]
            return gm_row, valid

        self.gm_src, self.valid = synth(self.mass)
        (self._update_fn, self._adaptive_fn,
         self._record_fn) = self._build_update()
        self._hooked_key = self._hooked_fn = None
        self._hooked_adaptive = self._hooked_record = None
        self._host_cache = None
        return self

    def _build_update(self, extra_force=None, set_aux=True):
        """Build the jitted (update, adaptive, record) triple; ``set_aux``
        additionally stashes the raw substep closure for tests. ``extra_force(pos, vel) -> acc`` is the
        sharded form of the single-chip hook: a POINTWISE per-particle
        field (it runs inside shard_map on local rows), composed with
        self-gravity before the mask; the fused pallas_ring kernel cannot
        take an external term, so a hooked world computes the ring force
        through the per-hop kernel and integrates outside (same fallback
        as the single-chip fused path)."""
        mesh = self.mesh
        d = self.n_devices
        config = self.config
        force_backend = self.force_backend
        src_len = self.src_len

        if force_backend in ("pm", "p3m"):
            # pm/p3m: no per-substep source reshard (gm_src holds the
            # per-TARGET gm row, sharded like pos); all comm is fixed-size
            # grid/cell-block collectives. The WHOLE n-substep loop runs
            # inside one shard_map call (_grid_device_loop), so p3m carries
            # its frozen collective bins across substeps — the sharded
            # p3m_rebin_interval path and the hoisted exact-core selection.
            loop = functools.partial(
                _grid_device_loop, config=config,
                force_backend=force_backend, d=d, extra_force=extra_force)
            smapped_loop = jax.shard_map(
                lambda pos, vel, acc, radius, gm_row, valid, dt, n: loop(
                    pos, vel, acc, radius, gm_row, valid, dt, n),
                mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                          P(AXIS), P(AXIS), P(AXIS, None), P(), P()),
                out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
                check_vma=False,
            )

            if config.merge_collisions:
                # pm only (p3m+merging rejected at construction): one
                # collective substep per iteration, then the jit-level
                # merge pass over the full-length gm row
                from ..ops.collisions import merge_pass

                def mstep(pos, vel, acc, radius, mass, gm_row, valid, dt):
                    pos, vel, acc = smapped_loop(
                        pos, vel, acc, radius, gm_row, valid, dt,
                        jnp.int32(1))
                    pos, vel, radius, mass, gm_row = merge_pass(
                        pos, vel, radius, mass, gm_row,
                        factor=config.merge_factor, g=config.g,
                        chunk=min(512, gm_row.shape[0]))
                    return pos, vel, acc, radius, mass, gm_row

                return _build_merging_fns(mstep)

            @functools.partial(
                jax.jit, static_argnames=("frames", "steps", "capture"),
                donate_argnums=(0, 1, 2))
            def record_run(pos, vel, acc, radius, mass, gm_src, valid, dt,
                           *, frames, steps, capture=None):
                cap = capture if capture is not None else _pos_capture

                def frame_body(carry, _):
                    pos, vel, acc = carry
                    pos, vel, acc = smapped_loop(
                        pos, vel, acc, radius, gm_src, valid, dt,
                        jnp.int32(steps))
                    st = Particles(pos=pos, vel=vel, acc=acc, mass=mass,
                                   radius=radius)
                    return (pos, vel, acc), cap(st, gm_src)

                return jax.lax.scan(frame_body, (pos, vel, acc), None,
                                    length=frames)

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def update(pos, vel, acc, radius, gm_src, valid, dt, n):
                return smapped_loop(pos, vel, acc, radius, gm_src, valid,
                                    dt, n)

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def adaptive(pos, vel, acc, radius, gm_src, valid,
                         t_span, eta, dt_min, dt_max):
                def one(p, v, a, dt):
                    # one-substep collective loop per adaptive iteration
                    # (p3m rebins each substep, matching the single-chip
                    # adaptive path)
                    return smapped_loop(p, v, a, radius, gm_src, valid,
                                        dt, jnp.int32(1))

                return _adaptive_while(one, pos, vel, acc, radius,
                                       t_span, eta, dt_min, dt_max)

            return update, adaptive, record_run
        else:
            if force_backend == "pallas_ring":
                step = functools.partial(
                    _fused_ring_step_shard, n_devices=d, config=config,
                    pos_dt=1.0 if config.integrator == "euler" else 0.5,
                )
            else:
                step = functools.partial(
                    _ring_step_shard,
                    n_devices=d, config=config, force_backend=force_backend,
                )

            smapped = jax.shard_map(
                lambda pos, vel, radius, gm_src, src_pos0, valid, dt: step(
                    pos, vel, radius, gm_src, src_pos0, valid, dt),
                mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                          P(AXIS, None), P(AXIS, None), P()),
                out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
                # pallas_call outputs don't carry varying-mesh-axis metadata
                check_vma=False,
            )

            force = functools.partial(
                _ring_force_shard,
                n_devices=d, config=config,
                force_backend=("pallas" if force_backend == "pallas_ring"
                               else force_backend),
            )
            smapped_force = jax.shard_map(
                lambda pos, radius, gm_src, src_pos0, valid: force(
                    pos, radius, gm_src, src_pos0, valid
                ),
                mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS), P(AXIS),
                          P(AXIS, None), P(AXIS, None)),
                out_specs=P(AXIS, None),
                check_vma=False,
            )

        def gather_src(p):
            # source shard = slice of the global massive prefix, gathered
            # from the (possibly cross-shard) first src_len rows.
            return jax.lax.with_sharding_constraint(
                p[:src_len], NamedSharding(mesh, P(AXIS, None))
            )

        def substep(pos, vel, acc, radius, gm_src, valid, dt):
            ws = integrators.stage_weights(config.integrator)
            if extra_force is not None:
                # hooked: ring force via smapped_force, user field composed
                # and masked outside, integrate outside (entry vel to the
                # hook at every stage — single-chip semantics)
                v0 = vel
                for w in (1.0,) if ws is None else ws:
                    dtk = dt if w == 1.0 else w * dt
                    pos_h = pos if ws is None else pos + (0.5 * dtk) * vel
                    acc = smapped_force(pos_h, radius, gm_src,
                                        gather_src(pos_h), valid)
                    acc = acc + forces.checked_extra_acc(
                        extra_force, pos_h, v0) * valid
                    vel = vel + dtk * acc
                    pos = (pos_h + dtk * vel if ws is None
                           else pos_h + (0.5 * dtk) * vel)
                return pos, vel, acc
            if ws is None:
                # semi-implicit Euler, whole substep inside the shard_map
                return smapped(pos, vel, radius, gm_src, gather_src(pos),
                               valid, dt)
            for w in ws:
                # position-Verlet (DKD) stage: force at the stage midpoint
                dtk = dt if w == 1.0 else w * dt
                pos_h = pos + (0.5 * dtk) * vel
                if force_backend == "pallas_ring":
                    # kick + half-drift fused in-kernel (pos_dt=0.5)
                    pos, vel, acc = smapped(pos_h, vel, radius, gm_src,
                                            gather_src(pos_h), valid, dtk)
                else:
                    acc = smapped_force(pos_h, radius, gm_src,
                                        gather_src(pos_h), valid)
                    vel = vel + dtk * acc
                    pos = pos_h + (0.5 * dtk) * vel
            return pos, vel, acc

        if set_aux:
            self._substep = substep

        if config.merge_collisions:
            # ring backends: substep (shard_map) then the jit-level merge
            # pass over the massive prefix (gm_src has length src_len, the
            # same prefix the single-chip pass scans)
            from ..ops.collisions import merge_pass

            def mstep(pos, vel, acc, radius, mass, gm_src, valid, dt):
                pos, vel, acc = substep(pos, vel, acc, radius, gm_src,
                                        valid, dt)
                pos, vel, radius, mass, gm_src = merge_pass(
                    pos, vel, radius, mass, gm_src,
                    factor=config.merge_factor, g=config.g,
                    chunk=min(512, gm_src.shape[0]))
                return pos, vel, acc, radius, mass, gm_src

            return _build_merging_fns(mstep)

        @functools.partial(
            jax.jit, static_argnames=("frames", "steps", "capture"),
            donate_argnums=(0, 1, 2))
        def record_run(pos, vel, acc, radius, mass, gm_src, valid, dt, *,
                       frames, steps, capture=None):
            cap = capture if capture is not None else _pos_capture

            def frame_body(carry, _):
                pos, vel, acc = carry
                pos, vel, acc = jax.lax.fori_loop(
                    0, steps,
                    lambda _, c: substep(*c, radius, gm_src, valid, dt),
                    (pos, vel, acc))
                st = Particles(pos=pos, vel=vel, acc=acc, mass=mass,
                               radius=radius)
                return (pos, vel, acc), cap(st, gm_src)

            return jax.lax.scan(frame_body, (pos, vel, acc), None,
                                length=frames)

        @functools.partial(
            jax.jit, donate_argnums=(0, 1, 2),
        )
        def update(pos, vel, acc, radius, gm_src, valid, dt, n):
            def body(_, carry):
                return substep(*carry, radius, gm_src, valid, dt)

            return jax.lax.fori_loop(0, n, body, (pos, vel, acc))

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def adaptive(pos, vel, acc, radius, gm_src, valid,
                     t_span, eta, dt_min, dt_max):
            def one(p, v, a, dt):
                return substep(p, v, a, radius, gm_src, valid, dt)

            return _adaptive_while(one, pos, vel, acc, radius,
                                   t_span, eta, dt_min, dt_max)

        return update, adaptive, record_run

    def record(self, dt: float, frames: int, steps_per_frame: int = 1,
               extra_force=None):
        """On-device sharded trajectory capture: frames*steps_per_frame
        substeps run in ONE jitted scan, positions stacked on device (the
        frame axis is unsharded; the particle axis keeps its mesh sharding),
        with a single device->host gather at the end — the sharded analogue
        of :func:`nbody_tpu.trajectory.record_states` (replaces the round-1
        per-frame host readback, the exact pattern the single-chip path was
        built to kill — ref TODO README.md:97).

        Advances the world's state. Returns host (frames, total_len, 2).
        ``extra_force`` composes a user field inside the capture scan (same
        per-shard pointwise contract as :meth:`update`)."""
        if extra_force is None:
            run = self._record_fn
        else:
            if self._hooked_key is not extra_force:
                (self._hooked_fn, self._hooked_adaptive,
                 self._hooked_record) = self._build_update(
                    extra_force=extra_force, set_aux=False)
                self._hooked_key = extra_force
            run = self._hooked_record

        if self.config.merge_collisions:
            (self.pos, self.vel, self.acc, self.radius, self.mass,
             self.gm_src), traj = run(
                self.pos, self.vel, self.acc, self.radius, self.mass,
                self.gm_src, self.valid, jnp.float32(dt), frames=frames,
                steps=steps_per_frame)
        else:
            (self.pos, self.vel, self.acc), traj = run(
                self.pos, self.vel, self.acc, self.radius, self.mass,
                self.gm_src, self.valid, jnp.float32(dt), frames=frames,
                steps=steps_per_frame)
        self._host_cache = None
        return np.asarray(traj[:, : self.total_len, :])

    def record_observables(self, dt: float, frames: int,
                           steps_per_frame: int = 1, extra_force=None,
                           energy: str | None = "exact", capture=None,
                           **capture_kw) -> dict:
        """Sharded observable streaming: the multi-chip analogue of
        :func:`nbody_tpu.trajectory.record_observables`. Per frame the hosts
        receive a handful of scalars (kinetic/potential energy, momentum,
        angular momentum, center of mass) computed ON the sharded arrays
        inside the same jitted capture scan as :meth:`record` — XLA/GSPMD
        turns the reductions into cross-device collectives, so host traffic
        is O(scalars)/frame regardless of N or mesh size. ``energy`` picks
        the potential estimator (``"exact"`` pair sum — GSPMD gathers the
        massive prefix, affordable to ~100k; ``"pm"`` mesh estimate for
        large N; ``None``). A custom ``capture(state, gm) -> pytree``
        overrides the default set; note ``gm`` is the backend's native gm
        layout (massive-prefix slice on ring backends, per-target row on
        pm/p3m) — prefer ``state.mass``. Advances the world's state; returns
        host numpy series keyed by observable, plus ``"time"``. ``energy`` /
        ``**capture_kw`` configure the default set and are rejected
        alongside a custom ``capture``; the default capture is lru_cached
        per settings so repeated calls reuse one compiled scan."""
        from ..diagnostics import (
            check_observables_args,
            observables_capture,
            observables_series_out,
        )

        check_observables_args(capture, energy, capture_kw)
        if capture is None:
            capture = observables_capture(self.mass_len, energy=energy,
                                          **capture_kw)
        if extra_force is None:
            run = self._record_fn
        else:
            if self._hooked_key is not extra_force:
                (self._hooked_fn, self._hooked_adaptive,
                 self._hooked_record) = self._build_update(
                    extra_force=extra_force, set_aux=False)
                self._hooked_key = extra_force
            run = self._hooked_record

        if self.config.merge_collisions:
            (self.pos, self.vel, self.acc, self.radius, self.mass,
             self.gm_src), series = run(
                self.pos, self.vel, self.acc, self.radius, self.mass,
                self.gm_src, self.valid, jnp.float32(dt), frames=frames,
                steps=steps_per_frame, capture=capture)
        else:
            (self.pos, self.vel, self.acc), series = run(
                self.pos, self.vel, self.acc, self.radius, self.mass,
                self.gm_src, self.valid, jnp.float32(dt), frames=frames,
                steps=steps_per_frame, capture=capture)
        self._host_cache = None
        return observables_series_out(series, frames, steps_per_frame, dt)

    def update(self, dt: float, n: int = 1,
               extra_force=None) -> "ShardedWorld":
        """n substeps. ``extra_force(pos, vel) -> acc`` composes a user
        acceleration field with self-gravity, per shard (it must be a
        pointwise per-particle function — it sees local rows). The hooked
        update is built once per hook function and cached; define the hook
        once and reuse the same object."""
        if n <= 0:
            return self
        if extra_force is None:
            fn = self._update_fn
        else:
            if self._hooked_key is not extra_force:
                (self._hooked_fn, self._hooked_adaptive,
                 self._hooked_record) = self._build_update(
                    extra_force=extra_force, set_aux=False)
                self._hooked_key = extra_force
            fn = self._hooked_fn
        if self.config.merge_collisions:
            (self.pos, self.vel, self.acc, self.radius, self.mass,
             self.gm_src) = fn(
                self.pos, self.vel, self.acc, self.radius, self.mass,
                self.gm_src, self.valid, jnp.float32(dt), jnp.int32(n))
        else:
            self.pos, self.vel, self.acc = fn(
                self.pos, self.vel, self.acc, self.radius, self.gm_src,
                self.valid, jnp.float32(dt), jnp.int32(n),
            )
        self._host_cache = None
        return self

    def update_adaptive(self, t_span: float, *, eta: float = 0.1,
                        dt_min: float = 1e-5, dt_max: float = 1.0,
                        extra_force=None) -> int:
        """Integrate ``t_span`` physical time units with per-substep global
        adaptive dt — the sharded counterpart of
        :meth:`nbody_tpu.world.World.update_adaptive`. The criterion's min
        reduces over the global (sharded) accelerations, so every shard
        steps with the same dt. All knobs are traced (retuning never
        recompiles). Returns the number of substeps taken."""
        if extra_force is None:
            fn = self._adaptive_fn
        else:
            if self._hooked_key is not extra_force:
                (self._hooked_fn, self._hooked_adaptive,
                 self._hooked_record) = self._build_update(
                    extra_force=extra_force, set_aux=False)
                self._hooked_key = extra_force
            fn = self._hooked_adaptive
        knobs = (jnp.float32(t_span), jnp.float32(eta),
                 jnp.float32(dt_min), jnp.float32(dt_max))
        if self.config.merge_collisions:
            (self.pos, self.vel, self.acc, self.radius, self.mass,
             self.gm_src, k) = fn(
                self.pos, self.vel, self.acc, self.radius, self.mass,
                self.gm_src, self.valid, *knobs)
        else:
            self.pos, self.vel, self.acc, k = fn(
                self.pos, self.vel, self.acc, self.radius, self.gm_src,
                self.valid, *knobs)
        self._host_cache = None
        return int(jax.device_get(k))

    @property
    def state(self) -> Particles:
        """Padded device state as a Particles pytree (sharded arrays) — the
        same view World exposes, so diagnostics/checks work on both."""
        return Particles(pos=self.pos, vel=self.vel, acc=self.acc,
                         mass=self.mass, radius=self.radius)

    @property
    def particles(self) -> Particles:
        if self._host_cache is None:
            n = self.total_len
            self._host_cache = Particles(
                pos=np.asarray(self.pos)[:n],
                vel=np.asarray(self.vel)[:n],
                acc=np.asarray(self.acc)[:n],
                mass=np.asarray(self.mass)[:n],
                radius=np.asarray(self.radius)[:n],
            )
        return self._host_cache

    def block_until_ready(self) -> "ShardedWorld":
        jax.block_until_ready((self.pos, self.vel, self.acc))
        return self

    def __len__(self) -> int:
        return self.total_len
