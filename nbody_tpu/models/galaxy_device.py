"""Device-side spiral-galaxy generator (jax.random, jit-compatible).

The host generator (`nbody_tpu.galaxy`) mirrors the reference algorithm with
numpy; this module is the TPU-first variant mandated by BASELINE.json
("galaxy.h scene generation reimplemented device-side"): all per-particle
synthesis runs vectorized on device under jit, with `jax.random` keys instead
of libc rand() (reference: src/lib/galaxy.c:31-221, constants
include/galaxy.h:10-61).

Structure (galaxy_count is a static Python int, so the per-galaxy scaffolding
unrolls at trace time; every O(N) operation is traced jnp):
  * particle budget: fractions drawn once, normalized to the exact total;
  * cores: radius ~ U[200,600), mass = (4*pi*rho/3) r^3;
  * placement: rejection sampling as a bounded `lax.while_loop` per galaxy
    (collision test vectorized over prior galaxies);
  * velocity kicks: pairwise tangential terms, unrolled (O(G^2) scalars);
  * particles: fully vectorized — spiral parameter t ~ U[t0,t1), non-uniform
    angular/radial jitter, arm assignment, distance-proportional massless
    rule, circular orbital velocity.

Differences from the host generator (documented, not bugs): per-galaxy
particle budget uses normalized uniform fractions rather than the reference's
sequential integer carving (same qualitative distribution; both respect the
100-particle minimum), and the RNG stream is jax.random, so scenes match the
host generator in distribution, not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import DEFAULT_GALAXY_CONFIG, DTYPE, G, GalaxyConfig, Particles

MAX_PLACEMENT_TRIES = 256


def _place_galaxy(key, i: int, core_pos, max_dist, cfg: GalaxyConfig):
    """Rejection-sampled position for galaxy i given galaxies [0, i)
    (galaxy.c:82-118), as a bounded while_loop on device."""
    two_pi = 2.0 * cfg.pi

    def try_once(key):
        key, k1, k2, k3 = jax.random.split(key, 4)
        parent = jax.random.randint(k1, (), 0, i)
        sep_scale = max_dist[i] + max_dist[parent]
        min_sep = cfg.min_galaxy_separation * sep_scale
        max_sep = cfg.max_galaxy_separation * sep_scale
        dist = jnp.sqrt(jax.random.uniform(k2, (), DTYPE, min_sep**2, max_sep**2))
        ang = jax.random.uniform(k3, (), DTYPE, 0.0, two_pi)
        cand = core_pos[parent] + dist * jnp.array([jnp.cos(ang), jnp.sin(ang)])
        # collision against all prior galaxies except the parent
        idx = jnp.arange(core_pos.shape[0])
        prior = (idx < i) & (idx != parent)
        min_seps = cfg.min_galaxy_separation * (max_dist[i] + max_dist)
        d2 = jnp.sum((core_pos - cand[None, :]) ** 2, axis=1)
        collision = jnp.any(prior & (d2 < min_seps**2))
        return key, cand, collision

    def cond(carry):
        _, _, collision, tries = carry
        return collision & (tries < MAX_PLACEMENT_TRIES)

    def body(carry):
        key, _, _, tries = carry
        key, cand, collision = try_once(key)
        return key, cand, collision, tries + 1

    key, cand0, coll0 = try_once(key)
    _, cand, _, _ = jax.lax.while_loop(cond, body, (key, cand0, coll0, 0))
    return cand


@functools.partial(jax.jit, static_argnames=("particle_count", "galaxy_count", "cfg"))
def make_galaxies_device(
    key: jax.Array,
    particle_count: int,
    galaxy_count: int,
    cfg: GalaxyConfig = DEFAULT_GALAXY_CONFIG,
) -> Particles:
    """Generate a spiral-galaxy scene entirely on device. Returns Particles
    of exactly `particle_count` rows (unsorted; feed to create_world)."""
    if particle_count < galaxy_count * cfg.min_particles_per_galaxy:
        raise ValueError(
            f"need at least {galaxy_count * cfg.min_particles_per_galaxy} particles "
            f"for {galaxy_count} galaxies, got {particle_count}"
        )
    two_pi = 2.0 * cfg.pi
    g = galaxy_count
    keys = jax.random.split(key, 8)

    # --- budget (normalized fractions; min 100 each) ---
    spare = particle_count - g * cfg.min_particles_per_galaxy
    frac = jax.random.dirichlet(keys[0], jnp.ones((g,), DTYPE))
    extras = jnp.floor(frac * spare).astype(jnp.int32)
    # hand the rounding remainder to the last galaxy (reference does the same,
    # galaxy.c:48-50)
    extras = extras.at[-1].add(spare - jnp.sum(extras))
    sizes = cfg.min_particles_per_galaxy + extras  # (g,) traced
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]])

    # --- cores (galaxy.c:68-79) ---
    core_radius = jax.random.uniform(keys[1], (g,), DTYPE, cfg.gc_min_r, cfg.gc_max_r)
    min_dist = core_radius * cfg.min_particle_dist_cr_f
    max_dist = (
        core_radius * cfg.max_particle_dist_cr_f
        + jnp.sqrt(sizes.astype(DTYPE)) * cfg.max_particle_dist_pc_f
    )
    core_mass = cfg.r_to_m(core_radius, cfg.gc_density)

    # --- placement (galaxy 0 at the origin) ---
    core_pos = jnp.zeros((g, 2), DTYPE)
    pkeys = jax.random.split(keys[2], max(g, 2))
    for i in range(1, g):
        cand = _place_galaxy(pkeys[i], i, core_pos, max_dist, cfg)
        core_pos = core_pos.at[i].set(cand)

    # --- tangential velocity kicks (galaxy.c:121-142) ---
    core_vel = jnp.zeros((g, 2), DTYPE)
    for i in range(1, g):
        for j in range(i):
            a_to_b = core_pos[j] - core_pos[i]
            dist = jnp.sqrt(jnp.sum(a_to_b**2))
            unit = a_to_b / dist
            speed_a = 0.3 * jnp.sqrt(G * core_mass[j] / dist)
            speed_b = 0.3 * jnp.sqrt(G * core_mass[i] / dist)
            core_vel = core_vel.at[i].add(speed_a * jnp.array([unit[1], -unit[0]]))
            core_vel = core_vel.at[j].add(speed_b * jnp.array([-unit[1], unit[0]]))

    # --- per-particle synthesis, fully vectorized over particle_count ---
    n = particle_count
    pidx = jnp.arange(n)
    # galaxy id of each particle row; core rows are each galaxy's offset
    gal = jnp.searchsorted(offsets, pidx, side="right") - 1
    is_core = pidx == offsets[gal]

    # spiral layout per galaxy (galaxy.c:153-176)
    init_off = jax.random.uniform(keys[3], (g,), DTYPE, 0.0, two_pi)
    spiral_count = jax.random.randint(keys[4], (g,), cfg.min_spirals, cfg.max_spirals + 1)
    spiral_angle = two_pi / spiral_count.astype(DTYPE)
    b = max_dist / two_pi
    t0 = min_dist / b

    sk = jax.random.split(keys[5], 8)
    t = jax.random.uniform(sk[0], (n,), DTYPE, t0[gal], two_pi)
    r = b[gal] * t
    t_off = jax.random.uniform(sk[1], (n,), DTYPE, 0.0, 0.6 * jnp.sqrt(spiral_angle[gal]))
    r_off = jax.random.uniform(
        sk[2], (n,), DTYPE, 0.0, 0.6 * jnp.sqrt(jnp.maximum(jnp.minimum(b[gal], r - min_dist[gal]), 0.0))
    )
    r_sign = jnp.where(jax.random.bernoulli(sk[3], 0.5, (n,)), 1.0, -1.0)
    t_sign = jnp.where(jax.random.bernoulli(sk[4], 0.5, (n,)), 1.0, -1.0)
    dist = r + r_sign * r_off * r_off
    ang = t + t_sign * t_off * t_off
    arm_idx = jax.random.randint(sk[5], (n,), 0, spiral_count[gal])
    arm = init_off[gal] + arm_idx.astype(DTYPE) * spiral_angle[gal]

    dx = dist * jnp.cos(ang + arm)
    dy = dist * jnp.sin(ang + arm)
    # gather core columns as (n,) vectors, NOT core_pos[gal] -> (n, 2): a
    # TPU gather output gets the tiled T(8,128) layout, padding the size-2
    # minor dim to 128 lanes — a 64x HBM expansion (16 GB at N=32M; this is
    # what capped the round-2 scale ceiling at 16.7M particles)
    cpx, cpy = core_pos[:, 0][gal], core_pos[:, 1][gal]
    px = cpx + dx
    py = cpy + dy

    # massless rule (galaxy.c:204-210) + body mass/radius
    dist_range = max_dist[gal] - min_dist[gal]
    massless = jax.random.uniform(sk[6], (n,), DTYPE) < (dist - min_dist[gal]) / dist_range
    body_r = jax.random.uniform(sk[7], (n,), DTYPE, cfg.np_min_r, cfg.np_max_r)
    radius = jnp.where(massless, cfg.tracer_radius, body_r)
    mass = jnp.where(massless, 0.0, cfg.r_to_m(body_r, cfg.np_density))

    # circular orbital velocity around the core (galaxy.c:213-215)
    speed = jnp.sqrt(G * core_mass[gal] / dist)
    cvx, cvy = core_vel[:, 0][gal], core_vel[:, 1][gal]
    vx = cvx + speed * (dy / dist)
    vy = cvy - speed * (dx / dist)

    # core rows override the synthesized values (columnwise, same reason)
    px = jnp.where(is_core, cpx, px)
    py = jnp.where(is_core, cpy, py)
    vx = jnp.where(is_core, cvx, vx)
    vy = jnp.where(is_core, cvy, vy)
    mass = jnp.where(is_core, core_mass[gal], mass)
    radius = jnp.where(is_core, core_radius[gal], radius)
    pos = jnp.stack([px, py], axis=1)
    vel = jnp.stack([vx, vy], axis=1)

    return Particles(
        pos=pos.astype(DTYPE),
        vel=vel.astype(DTYPE),
        acc=jnp.zeros((n, 2), DTYPE),
        mass=mass.astype(DTYPE),
        radius=radius.astype(DTYPE),
    )
