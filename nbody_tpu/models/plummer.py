"""Plummer-disk scene family (beyond the reference's spiral galaxies).

A self-gravitating 2D disk with the classic Plummer radial profile: every
particle carries equal mass (so mass_len == N — the all-massive stress case
for the force kernels), placed with radius sampled from the projected Plummer
distribution and given the circular speed of the enclosed mass. Generated
on device with jax.random, jit-compatible.

Reference has no counterpart (galaxy.c is its only scene family); this is an
additional model family, not a parity requirement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import DTYPE, G, Particles


@functools.partial(jax.jit, static_argnames=("n",))
def make_plummer_disk(
    key: jax.Array,
    n: int,
    *,
    scale: float = 400.0,
    # sets the dynamical time: v_circ(a) = sqrt(G*M/(2^1.5 a)) ~ 300 with the
    # defaults, so dt ~ 0.01 resolves orbits (dt*v << a)
    total_mass: float = 1.0e7,
    particle_radius: float = 2.0,
    r_max_scales: float = 8.0,
) -> Particles:
    """Equal-mass Plummer disk of n particles.

    Radius CDF (2D projected Plummer): r = a * sqrt(u) / sqrt(1 - u) for
    u ~ U[0,1), truncated at ``r_max_scales * scale``. Circular velocity from
    the enclosed-mass profile M(<r) = M_tot * r^3 / (r^2 + a^2)^{3/2} of the
    3D Plummer sphere (adequate for a visualization-grade disk).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    a = jnp.float32(scale)

    u_max = 1.0 - 1.0 / (1.0 + r_max_scales**2)
    u = jax.random.uniform(k1, (n,), DTYPE, 0.0, u_max)
    r = a * jnp.sqrt(u / (1.0 - u))
    theta = jax.random.uniform(k2, (n,), DTYPE, 0.0, 2.0 * jnp.pi)
    pos = r[:, None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)

    m = jnp.full((n,), total_mass / n, DTYPE)
    enclosed = total_mass * r**3 / (r**2 + a**2) ** 1.5
    speed = jnp.sqrt(G * enclosed / jnp.maximum(r, 1e-3))
    # tangential, with a small random isotropic perturbation for realism
    jitter = 0.05 * speed[:, None] * jax.random.normal(k3, (n, 2), DTYPE)
    vel = speed[:, None] * jnp.stack([-jnp.sin(theta), jnp.cos(theta)], axis=1) + jitter

    return Particles(
        pos=pos,
        vel=vel,
        acc=jnp.zeros((n, 2), DTYPE),
        mass=m,
        radius=jnp.full((n,), particle_radius, DTYPE),
    )
