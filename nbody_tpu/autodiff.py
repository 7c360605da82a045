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
    jax.jit, static_argnames=("n_steps", "mass_len", "precise", "remat", "g")
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
):
    """Differentiable n_steps-substep rollout. Inputs must be in
    massive-first order (sources = rows [0, mass_len)). Returns final
    (pos, vel). Differentiable w.r.t. pos, vel, mass, radius, and dt."""
    gm = g * mass[:mass_len]

    def step(carry, _):
        p, v = carry
        acc = forces.direct_sum_acc(p, radius, p[:mass_len], gm, precise=precise)
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
