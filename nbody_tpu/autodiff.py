"""Differentiable simulation rollouts.

A capability the C/Vulkan reference cannot express: because the step function
is a pure JAX transform, `jax.grad` flows through entire trajectories —
enabling initial-condition optimization, parameter fitting, and adjoint
analyses. Reverse-mode requires `lax.scan` (static step count) rather than
the dynamic `fori_loop` used by the production path; `jax.checkpoint`
(rematerialization) keeps memory O(sqrt)-ish instead of storing every
substep's residuals.

The jnp force backend is used: the Pallas kernel has no VJP registered (a
custom adjoint kernel is future work); XLA fuses the jnp path to within a few
percent of the kernel anyway (docs/BENCHMARKS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import forces
from .types import G, Particles


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "mass_len", "precise", "remat", "g", "backend",
                     "pm_grid"),
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
):
    """Differentiable n_steps-substep rollout. Inputs must be in
    massive-first order (sources = rows [0, mass_len)). Returns final
    (pos, vel). Differentiable w.r.t. pos, vel, mass, radius, and dt.

    backend="pallas" runs the forward force through the Pallas kernel with a
    custom VJP (backward = adjoint of the identical jnp math); inputs are
    padded internally to the kernel's tile alignment."""
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
        # outputs — gradients flow through the gathers they index)
        from .ops.p3m_forces import p3m_acc

        gm = gm_full[:mass_len]

        def force(p):
            return p3m_acc(p, radius, p[:mass_len], gm,
                           softening=pm_softening, grid=pm_grid,
                           precise=precise)

    else:
        gm = gm_full[:mass_len]

        def force(p):
            return forces.direct_sum_acc(p, radius, p[:mass_len], gm, precise=precise)

    def step(carry, _):
        p, v = carry
        acc = force(p)
        v = v + dt * acc
        p = p + dt * v
        return (p, v), None

    if remat:
        step = jax.checkpoint(step)
    (pos, vel), _ = jax.lax.scan(step, (pos, vel), None, length=n_steps)
    return pos, vel


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
