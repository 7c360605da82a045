"""Differentiable simulation rollouts.

A capability the C/Vulkan reference cannot express: because the step function
is a pure JAX transform, `jax.grad` flows through entire trajectories —
enabling initial-condition optimization, parameter fitting, and adjoint
analyses. Reverse-mode requires `lax.scan` (static step count) rather than
the dynamic `fori_loop` used by the production path; `jax.checkpoint`
(rematerialization) keeps memory O(sqrt)-ish instead of storing every
substep's residuals.

``backend="jnp"`` differentiates the XLA-fused direct sum directly.
``backend="pallas"`` runs the Pallas kernel forward through a custom VJP
(``ops.pallas_forces.make_differentiable_acc``) whose backward pass re-derives
the adjoint from the mathematically identical jnp formulation at backward
time — O(N) residuals, no O(N·S) storage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import forces, integrators
from .types import G, Particles




def _with_extra(force, vel, extra_force, params):
    """Compose the gravity closure with the user hook for one substep
    (vel = substep-entry velocity, like world._step)."""
    if extra_force is None:
        return force
    if params is None:
        return lambda p: force(p) + forces.checked_extra_acc(
            extra_force, p, vel)
    return lambda p: force(p) + forces.checked_extra_acc(
        extra_force, p, vel, params)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "mass_len", "precise", "remat", "g", "backend",
                     "pm_grid", "p3m_rc_cells", "p3m_cell_capacity",
                     "p3m_exact_targets", "p3m_rebin_interval",
                     "p3m_pp_chunk", "integrator", "extra_force"),
)
def rollout(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    radius: jax.Array,
    dt: jax.Array,
    *,
    n_steps: int,
    mass_len: int,
    precise: bool = True,
    remat: bool = True,
    g: float = G,
    backend: str = "jnp",
    pm_grid: int = 512,
    pm_softening: float = 2.0,
    p3m_rc_cells: int = 4,
    p3m_cell_capacity: int = 96,
    p3m_exact_targets: int = 64,
    p3m_rebin_interval: int = 1,
    p3m_pp_chunk: int = 0,
    integrator: str = "euler",
    extra_force=None,
    extra_force_params=None,
):
    """Differentiable n_steps-substep rollout. Inputs must be in
    massive-first order (sources = rows [0, mass_len)). Returns final
    (pos, vel). Differentiable w.r.t. pos, vel, mass, radius, and dt.

    ``integrator`` selects the time-stepping scheme (``"euler"`` —
    reference-exact default — ``"leapfrog"``, or ``"yoshida4"``; see
    nbody_tpu/integrators.py). All are pure compositions of the force
    closure, so reverse-mode AD flows through each identically.

    ``p3m_pp_chunk`` defaults to 0 (no PP chunk skipping) here, unlike the
    primal path's ``SimConfig.p3m_pp_chunk=64``: the skip predicate tests
    source gm != 0, and ``lax.cond``'s VJP returns a zero cotangent through
    the skipped branch — so with chunking enabled, d(loss)/d(mass) of an
    exactly-massless source whose whole chunk neighborhood is massless
    loses its (tiny) PP component. Primal values and all position/velocity
    gradients are identical either way (the PP force is identically zero
    throughout a skipped chunk, so those cotangents are correctly zero);
    opt back in with p3m_pp_chunk=64 when not differentiating w.r.t. mass.

    backend="pallas" runs the forward force through the Pallas kernel with a
    custom VJP (backward = adjoint of the identical jnp math); inputs are
    padded internally to the kernel's tile alignment.

    ``extra_force`` is the differentiable counterpart of
    ``World.update(extra_force=...)``: a user acceleration field added on
    top of self-gravity, called as ``extra_force(pos, vel)`` — or
    ``extra_force(pos, vel, extra_force_params)`` when
    ``extra_force_params`` (an arbitrary traced pytree) is given. The
    params form is how gradients reach CONTROL variables (thrust
    schedules, field strengths): the hook function itself is jit-static,
    so closing it over a traced array would leak a tracer — pass such
    values through ``extra_force_params`` instead, and ``jax.grad`` flows
    into them like any other argument. ``vel`` is the substep-entry
    velocity (matching the primal path)."""
    if backend not in ("jnp", "pallas", "pm", "p3m"):
        raise ValueError(
            f"unknown rollout backend {backend!r}; "
            "expected 'jnp', 'pallas', 'pm', or 'p3m'")
    n = pos.shape[0]
    gm_full = g * mass

    if backend == "pallas":
        from .ops.pallas_forces import SOURCE_ALIGN, TARGET_ALIGN, make_differentiable_acc
        from .types import DEFAULT_SIM_CONFIG, pad_to_tiles

        tile_t = DEFAULT_SIM_CONFIG.tile_targets
        tile_s = DEFAULT_SIM_CONFIG.tile_sources
        s_pad = pad_to_tiles(mass_len, SOURCE_ALIGN, tile_s)
        t_pad = pad_to_tiles(n, TARGET_ALIGN, tile_t)
        acc_fn = make_differentiable_acc(tile_t, tile_s, precise=precise)

        def force(p):
            pp = jnp.pad(p, ((0, t_pad - n), (0, 0)))
            rr = jnp.pad(radius, (0, t_pad - n), constant_values=1.0)
            sp = jnp.pad(p, ((0, max(s_pad - n, 0)), (0, 0)))[:s_pad]
            sg = jnp.pad(
                jnp.where(jnp.arange(n) < mass_len, gm_full, 0.0),
                (0, max(s_pad - n, 0)),
            )[:s_pad]
            return acc_fn(pp, rr, sp, sg)[:n]

    elif backend == "pm":
        # particle-mesh far field: pure jnp (FFT + scatter/gather), so
        # reverse-mode AD flows through natively — a differentiable
        # O(N + G^2 log G) solver for large-N rollouts
        from .ops.pm_forces import pm_acc

        gm = gm_full[:mass_len]

        def force(p):
            return pm_acc(p, p[:mass_len], gm,
                          softening=pm_softening, grid=pm_grid)

    elif backend == "p3m":
        # accurate-at-all-ranges O(N) solver; scatter/gather/FFT/sort are
        # all natively differentiable (sort/top_k indices are integer
        # outputs — gradients flow through the gathers they index).
        # Routed through the frozen-bins structure like world.update_state:
        # the constant exact-core top_k hoists out of the loop, and
        # ``p3m_rebin_interval`` > 1 amortizes the spatial bookkeeping
        # (cell sorts, box) over k substeps — positions are always read
        # fresh through the frozen orders, so pair math stays exact and
        # gradients flow through the same gathers.
        from .ops.p3m_forces import p3m_acc_from_bins, p3m_bins

        gm = gm_full[:mass_len]
        k_rebin = max(p3m_rebin_interval, 1)
        _, big0 = jax.lax.top_k(radius, min(p3m_exact_targets, n))

        def make_bins(p):
            return p3m_bins(
                p, radius, p[:mass_len], gm, grid=pm_grid,
                rc_cells=p3m_rc_cells, exact_targets=p3m_exact_targets,
                big=big0,
                composite_capacity=(p3m_cell_capacity
                                    if k_rebin > 1 else None))

        def one_step(p, v, bins):
            def f(pp):
                return p3m_acc_from_bins(
                    bins, pp, radius, pp[:mass_len], gm,
                    softening=pm_softening, grid=pm_grid,
                    rc_cells=p3m_rc_cells, cell_capacity=p3m_cell_capacity,
                    precise=precise, pp_chunk=p3m_pp_chunk or None)

            f = _with_extra(f, v, extra_force, extra_force_params)
            p, v, _ = integrators.advance(integrator, f, p, v, dt)
            return p, v

        def make_block(steps):
            def block(carry, _):
                p, v = carry
                bins = make_bins(p)
                for _ in range(steps):
                    p, v = one_step(p, v, bins)
                return (p, v), None

            return jax.checkpoint(block) if remat else block

        carry, _ = jax.lax.scan(make_block(k_rebin), (pos, vel), None,
                                length=n_steps // k_rebin)
        rem = n_steps % k_rebin
        if rem:
            carry, _ = make_block(rem)(carry, None)
        return carry

    else:
        gm = gm_full[:mass_len]

        def force(p):
            return forces.direct_sum_acc(p, radius, p[:mass_len], gm, precise=precise)

    def step(carry, _):
        p, v = carry
        f = _with_extra(force, v, extra_force, extra_force_params)
        p, v, _ = integrators.advance(integrator, f, p, v, dt)
        return (p, v), None

    if remat:
        step = jax.checkpoint(step)
    (pos, vel), _ = jax.lax.scan(step, (pos, vel), None, length=n_steps)
    return pos, vel


# bounded: the key includes the user's extra_force function identity, so a
# lambda-per-call hook would otherwise grow the cache (and its compiled
# executables) without limit
@functools.lru_cache(maxsize=64)
def _sharded_rollout_fn(mesh, n, n_pad, mass_len, n_steps, backend, precise,
                        remat, g, pm_grid, pm_softening, p3m_rc_cells,
                        p3m_cell_capacity, p3m_exact_targets, p3m_pp_chunk,
                        chunk, integrator, extra_force, has_params):
    from jax.sharding import PartitionSpec as P

    from .parallel.sharding import AXIS

    d = mesh.devices.size

    def body(pos, vel, radius, gm, valid, dt, params):
        # per-device shards; collectives inside are differentiable (ppermute
        # transposes to the inverse ring, psum/all_gather to their adjoints)
        if backend == "pm":
            from .ops.pm_forces import pm_acc_collective

            def force(p):
                return pm_acc_collective(
                    p, p, gm, softening=pm_softening, grid=pm_grid,
                    tgt_mask=valid, axis_name=AXIS) * valid

        elif backend == "p3m":
            from .ops.p3m_forces import p3m_acc_collective

            def force(p):
                return p3m_acc_collective(
                    p, radius, gm, softening=pm_softening, grid=pm_grid,
                    rc_cells=p3m_rc_cells, cell_capacity=p3m_cell_capacity,
                    exact_targets=p3m_exact_targets, precise=precise,
                    tgt_mask=valid, pp_chunk=p3m_pp_chunk or None,
                    axis_name=AXIS, n_devices=d) * valid

        else:
            # ring of RESIDENT tiles: every device's own rows (gm-masked)
            # rotate around the ring — no prefix gather needed inside the
            # scan, and massless/padding rows contribute exactly zero
            perm = [(i, (i + 1) % d) for i in range(d)]

            def force(p):
                acc = jnp.zeros_like(p)
                sp, sg = p, gm
                for hop in range(d):
                    if hop < d - 1:
                        nsp = jax.lax.ppermute(sp, AXIS, perm)
                        nsg = jax.lax.ppermute(sg, AXIS, perm)
                    acc = acc + forces.direct_sum_acc(
                        p, radius, sp, sg,
                        chunk=min(chunk, p.shape[0]), precise=precise)
                    if hop < d - 1:
                        sp, sg = nsp, nsg
                return acc * valid

        def step(carry, _):
            p, v = carry
            if extra_force is None:
                f = force
            else:
                # the hook sees LOCAL rows (pointwise per-particle field,
                # same contract as ShardedWorld.update's hook), masked so
                # padding rows stay inert; params are replicated and grads
                # flow into them through shard_map's psum'd adjoint
                def f(pp, _v=v):
                    extra = (forces.checked_extra_acc(extra_force, pp, _v,
                                                      params)
                             if has_params else
                             forces.checked_extra_acc(extra_force, pp, _v))
                    return force(pp) + extra * valid
            p, v, _ = integrators.advance(integrator, f, p, v, dt)
            return (p, v), None

        if remat:
            step = jax.checkpoint(step)
        (pos, vel), _ = jax.lax.scan(step, (pos, vel), None, length=n_steps)
        return pos, vel

    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                  P(AXIS, None), P(), P()),
        out_specs=(P(AXIS, None), P(AXIS, None)),
        check_vma=False,
    )

    @jax.jit
    def run(pos, vel, mass, radius, dt, params):
        def pad2(a):
            return jnp.pad(a, ((0, n_pad - n), (0, 0)))

        gm = jnp.where(jnp.arange(n) < mass_len, g * mass, 0.0)
        gm = jnp.pad(gm.astype(pos.dtype), (0, n_pad - n))
        rad = jnp.pad(radius.astype(pos.dtype), (0, n_pad - n),
                      constant_values=1.0)
        valid = (jnp.arange(n_pad) < n).astype(pos.dtype)[:, None]
        p, v = smapped(pad2(pos), pad2(vel), rad, gm, valid,
                       jnp.asarray(dt, pos.dtype), params)
        return p[:n], v[:n]

    return run


def rollout_sharded(
    pos, vel, mass, radius, dt, *,
    n_steps: int,
    mass_len: int,
    mesh,
    backend: str = "jnp",
    precise: bool = True,
    remat: bool = True,
    g: float = G,
    pm_grid: int = 512,
    pm_softening: float = 2.0,
    p3m_rc_cells: int = 4,
    p3m_cell_capacity: int = 96,
    p3m_exact_targets: int = 64,
    p3m_pp_chunk: int = 0,
    chunk: int = 512,
    integrator: str = "euler",
    extra_force=None,
    extra_force_params=None,
):
    """Differentiable rollout sharded over a 1-D device mesh.

    ``p3m_pp_chunk`` defaults to 0 for gradient exactness w.r.t. mass —
    see the note on :func:`rollout`.

    Multi-chip counterpart of :func:`rollout` (the reference cannot express
    either): the whole n_steps scan runs inside ONE ``shard_map``, with the
    force computed by differentiable collectives — a ``ppermute`` ring of
    resident (pos, gm) tiles for ``backend="jnp"`` (gm-masked rows make
    massless/padding rows inert, so no prefix reshard is needed inside the
    scan), or the collective pm / p3m grid solvers. Reverse-mode AD flows
    through the collectives (ppermute transposes to the inverse ring;
    psum/all_gather to their adjoints), so ``jax.grad`` of a loss on the
    returned global (pos, vel) gives per-particle sensitivities at
    multi-chip scale. Inputs must be massive-first ordered (as
    :func:`rollout`); returns final global (pos, vel) of length N.

    ``extra_force`` / ``extra_force_params`` mirror :func:`rollout`'s hook:
    a pointwise per-particle field composed with self-gravity per shard
    (it sees LOCAL rows), with gradients flowing into the replicated
    params through the shard_map adjoint — sharded differentiable control.
    The compiled rollout is cached on the hook's FUNCTION IDENTITY (same
    contract as ``ShardedWorld.update``): define the hook once and reuse
    the same object, or every call re-traces and re-compiles.
    """
    from .types import round_up

    n = pos.shape[0]
    if backend not in ("jnp", "pm", "p3m"):
        raise ValueError(
            f"unknown sharded rollout backend {backend!r}; "
            "expected 'jnp', 'pm', or 'p3m'")
    d = mesh.devices.size
    n_pad = round_up(n, 8 * d)
    if n_pad // d > chunk:
        # the jnp ring's chunked direct sum requires chunk | n_loc
        n_pad = round_up(n_pad, chunk * d)
    fn = _sharded_rollout_fn(
        mesh, n, n_pad, mass_len, n_steps, backend, precise, remat, g,
        pm_grid, pm_softening, p3m_rc_cells, p3m_cell_capacity,
        p3m_exact_targets, p3m_pp_chunk, chunk, integrator,
        extra_force, extra_force_params is not None)
    params = (jnp.float32(0.0) if extra_force_params is None
              else extra_force_params)
    return fn(pos, vel, mass, radius, jnp.asarray(dt, jnp.float32), params)


def rollout_particles(particles: Particles, dt, n_steps: int, mass_len: int, **kw):
    pos, vel = rollout(
        particles.pos, particles.vel, particles.mass, particles.radius,
        jnp.asarray(dt, jnp.float32), n_steps=n_steps, mass_len=mass_len, **kw,
    )
    return Particles(pos=pos, vel=vel, acc=particles.acc,
                     mass=particles.mass, radius=particles.radius)


def trajectory_loss(target_pos: jax.Array, index: int):
    """Loss factory: squared distance of particle `index` from `target_pos`
    at rollout end — the classic 'aim the tracer' objective."""

    def loss(pos0, vel0, mass, radius, dt, *, n_steps, mass_len, **kw):
        pos, _ = rollout(pos0, vel0, mass, radius, dt,
                         n_steps=n_steps, mass_len=mass_len, **kw)
        return jnp.sum((pos[index] - target_pos) ** 2)

    return loss
