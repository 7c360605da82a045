"""Kepler-disk and cold-collapse scene families (beyond the reference).

Two classic N-body test problems the spiral-galaxy generator cannot express:

* **Kepler disk** — one dominant central mass plus a rotation-supported ring
  of light bodies on near-circular orbits. The cleanest accuracy probe for
  the approximate backends (pm/p3m error shows up as orbit precession /
  radius drift against the analytic circular speed) and the natural stage
  for collision merging (planetesimal accretion).
* **Cold disk** — a uniform disk at rest: gravitational collapse from cold
  initial conditions, the standard stress test for adaptive timestepping
  (the criterion must shrink dt through the central caustic).

Both are generated on device with jax.random and jit once per (n,) like
models/plummer.py. Reference has no counterpart (galaxy.c is its only scene
family); these are additional model families, not a parity requirement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import DTYPE, G, Particles


@functools.partial(jax.jit, static_argnames=("n",))
def make_kepler_disk(
    key: jax.Array,
    n: int,
    *,
    central_mass: float = 1.0e7,
    central_radius: float = 10.0,
    body_mass: float = 1.0,
    body_radius: float = 0.5,
    r_min: float = 200.0,
    r_max: float = 1200.0,
    eccentricity_jitter: float = 0.0,
) -> Particles:
    """Central body (row 0) + ``n - 1`` light bodies on circular orbits.

    Radii are sampled with a uniform surface density (r ~ sqrt(U) over the
    annulus); each body gets the exact circular speed for the dominant
    central mass, v = sqrt(G*M_c / r) (the light bodies' self-gravity is a
    ~(n*body_mass/M_c) perturbation). ``eccentricity_jitter`` adds a
    fractional random radial velocity for non-circular variants.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    m = n - 1
    u = jax.random.uniform(k1, (m,), DTYPE)
    r = jnp.sqrt(r_min**2 + u * (r_max**2 - r_min**2))
    theta = jax.random.uniform(k2, (m,), DTYPE, 0.0, 2.0 * jnp.pi)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    pos = r[:, None] * jnp.stack([cos_t, sin_t], axis=1)

    speed = jnp.sqrt(G * central_mass / r)
    vel = speed[:, None] * jnp.stack([-sin_t, cos_t], axis=1)
    # applied unconditionally: the knob is traced under jit (only n is
    # static), so a python `if` on it would fail on any explicit value
    vel = vel + (jnp.float32(eccentricity_jitter) * speed[:, None]
                 * jax.random.normal(k3, (m, 2), DTYPE))

    pos = jnp.concatenate([jnp.zeros((1, 2), DTYPE), pos], axis=0)
    vel = jnp.concatenate([jnp.zeros((1, 2), DTYPE), vel], axis=0)
    mass = jnp.concatenate([jnp.full((1,), central_mass, DTYPE),
                            jnp.full((m,), body_mass, DTYPE)])
    radius = jnp.concatenate([jnp.full((1,), central_radius, DTYPE),
                              jnp.full((m,), body_radius, DTYPE)])
    # zero net momentum: give the central body the opposite of the disk's
    # total momentum so the system's center of mass stays put
    disk_mom = jnp.sum(mass[1:, None] * vel[1:], axis=0)
    vel = vel.at[0].set(-disk_mom / central_mass)
    return Particles(pos=pos, vel=vel, acc=jnp.zeros((n, 2), DTYPE),
                     mass=mass, radius=radius)


@functools.partial(jax.jit, static_argnames=("n",))
def make_cold_disk(
    key: jax.Array,
    n: int,
    *,
    total_mass: float = 1.0e7,
    extent: float = 800.0,
    particle_radius: float = 2.0,
) -> Particles:
    """Uniform-density disk of equal masses AT REST (cold collapse).

    Positions uniform over a disk of radius ``extent`` (r ~ sqrt(U)); zero
    velocity everywhere, so the evolution is a pure collapse — total momentum
    is exactly zero and stays zero, and the shrinking free-fall timescale
    exercises adaptive dt.
    """
    k1, k2 = jax.random.split(key)
    r = extent * jnp.sqrt(jax.random.uniform(k1, (n,), DTYPE))
    theta = jax.random.uniform(k2, (n,), DTYPE, 0.0, 2.0 * jnp.pi)
    pos = r[:, None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
    return Particles(
        pos=pos,
        vel=jnp.zeros((n, 2), DTYPE),
        acc=jnp.zeros((n, 2), DTYPE),
        mass=jnp.full((n,), total_mass / n, DTYPE),
        radius=jnp.full((n,), particle_radius, DTYPE),
    )
