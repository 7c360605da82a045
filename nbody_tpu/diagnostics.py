"""Device-side physics diagnostics: momentum, energy, center of mass.

The reference exposes no diagnostics (its overlay shows FPS and sim mode
only); these are the quantities its de-facto correctness harness would have
needed (SURVEY.md §4). All computed on device in one jitted pass — O(N) for
momentum/CoM, O(N·M) (chunked) for potential energy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .types import G, Particles


@jax.jit
def total_momentum(state: Particles) -> jax.Array:
    """Sum of m·v, shape (2,). Conserved up to the asymmetric softening."""
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


@jax.jit
def center_of_mass(state: Particles) -> jax.Array:
    m = jnp.sum(state.mass)
    return jnp.sum(state.mass[:, None] * state.pos, axis=0) / jnp.maximum(m, 1e-30)


@jax.jit
def kinetic_energy(state: Particles) -> jax.Array:
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=1))


@functools.partial(jax.jit, static_argnames=("mass_len", "chunk", "g"))
def potential_energy(
    state: Particles, mass_len: int, *, chunk: int = 1024, g: float = G
) -> jax.Array:
    """Softened potential with the reference's (asymmetric) softening:
    U = -G/2 * sum_i sum_{j<mass_len, j!=i} m_i m_j / sqrt(d_ij^2 + r_i).
    Every nonzero term has a massive target (m_i > 0), i.e. is a
    massive-massive pair counted from both ends — hence the uniform 1/2."""
    n = state.pos.shape[0]
    src_pos = state.pos[:mass_len]
    src_m = state.mass[:mass_len]

    pad = (-n) % chunk
    pos = jnp.pad(state.pos, ((0, pad), (0, 0)))
    rad = jnp.pad(state.radius, (0, pad), constant_values=1.0)
    mass = jnp.pad(state.mass, (0, pad))
    idx = jnp.pad(jnp.arange(n), (0, pad), constant_values=-1)

    def tile_energy(tile):
        tpos, trad, tm, tidx = tile
        dx = src_pos[None, :, 0] - tpos[:, None, 0]
        dy = src_pos[None, :, 1] - tpos[:, None, 1]
        r = jnp.sqrt(dx * dx + dy * dy + trad[:, None])
        inv = jnp.where(
            tidx[:, None] == jnp.arange(mass_len)[None, :], 0.0, 1.0 / r
        )
        return -0.5 * g * jnp.sum(tm[:, None] * src_m[None, :] * inv)

    m = pos.shape[0] // chunk
    tiles = (
        pos.reshape(m, chunk, 2),
        rad.reshape(m, chunk),
        mass.reshape(m, chunk),
        idx.reshape(m, chunk),
    )
    return jnp.sum(jax.lax.map(tile_energy, tiles))


def total_energy(state: Particles, mass_len: int, **kw) -> jax.Array:
    return kinetic_energy(state) + potential_energy(state, mass_len, **kw)


def summary(world) -> dict:
    """Host-side diagnostic snapshot of a World."""
    st = world.state.slice_to(world.total_len)
    return {
        "n": world.total_len,
        "mass_len": world.mass_len,
        "momentum": tuple(float(x) for x in total_momentum(st)),
        "angular_momentum": float(angular_momentum(st)),
        "center_of_mass": tuple(float(x) for x in center_of_mass(st)),
        "kinetic_energy": float(kinetic_energy(st)),
        "potential_energy": float(potential_energy(st, world.mass_len)),
        "suggested_dt": float(suggest_dt(st)),
    }


@jax.jit
def angular_momentum(state: Particles) -> jax.Array:
    """Scalar z-angular momentum about the origin, L = sum m (x·vy - y·vx).
    Conserved by the pair force up to the reference's asymmetric per-target
    softening (same caveat as momentum) — a long-horizon drift diagnostic
    the reference never exposes."""
    x, y = state.pos[:, 0], state.pos[:, 1]
    vx, vy = state.vel[:, 0], state.vel[:, 1]
    return jnp.sum(state.mass * (x * vy - y * vx))


@functools.partial(jax.jit, static_argnames=("eta",))
def suggest_dt(state: Particles, *, eta: float = 0.1) -> jax.Array:
    """Global timestep suggestion: eta · min_i sqrt(eps_i / |a_i|) over rows
    with nonzero acceleration, where eps_i = sqrt(radius_i) is the softening
    length (the reference adds ``radius`` linearly to d², sim_cpu.c:176, so
    its square root is the length scale). The standard collisionless
    softening criterion — resolve the fastest orbit through the softened
    core. Uses the state's stored ``acc`` (valid after any substep); returns
    +inf for a force-free world."""
    a = jnp.sqrt(jnp.sum(state.acc**2, axis=1))
    eps = jnp.sqrt(state.radius)
    t = jnp.where(a > 0, jnp.sqrt(eps / jnp.maximum(a, 1e-30)), jnp.inf)
    return eta * jnp.min(t)
