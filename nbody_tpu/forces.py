"""Direct-sum softened gravity in pure jnp — the oracle / fallback backend.

This is the TPU framework's counterpart of the reference CPU backend
(``src/lib/sim_cpu.c:156-194``) and the force loop of the GPU shader
(``src/shader/particle_cs.glsl:35-49``). With ``precise=True`` the math is
reference-exact (sqrt + divide, particle_cs.glsl:42-48):

  radv    = pos_source - pos_target
  dist_sq = dot(radv, radv)
  r2      = dist_sq + radius_target        # softening adds the *target's*
                                           # radius, linear (sim_cpu.c:176,
                                           # particle_cs.glsl:41)
  acc    += radv * (G * m_source / (sqrt(r2) * r2))

Only massive particles exert force (loop bound ``mass_len``,
particle_cs.glsl:35); every particle moves. Self-interaction contributes zero
because radv == 0 (no special casing, matching the reference). Zero-mass
padding sources likewise contribute zero (the reference's zero-pad trick,
sim_cpu.c:133-142).

``precise`` convention (one switch, two layers): the math-layer functions in
this module and ``autodiff.rollout`` default to ``precise=True``
(reference-exact — they double as parity oracles), while the production
``SimConfig.precise`` defaults to ``False`` (rsqrt^3: ≤1.4e-7 relative error
vs fp64, ~45% faster on TPU — see PARITY.md). Anything driven by a SimConfig
inherits the production default; anything calling this module directly gets
reference semantics unless it opts out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import DTYPE, G, SOFTENING_FLOOR


def pair_acc(
    tgt_pos: jax.Array,
    tgt_radius: jax.Array,
    src_pos: jax.Array,
    src_gm: jax.Array,
    *,
    precise: bool = True,
) -> jax.Array:
    """Acceleration on each target from all sources, O(T*S) dense.

    Args:
      tgt_pos: (T, 2) target positions.
      tgt_radius: (T,) target radii (softening term).
      src_pos: (S, 2) source positions.
      src_gm: (S,) G * mass of each source (zero for non-exerting sources).
      precise: exact sqrt+divide (reference semantics) vs fast rsqrt.

    Returns:
      (T, 2) accelerations, fp32.
    """
    # (T, S) pairwise deltas per component.
    dx = src_pos[None, :, 0] - tgt_pos[:, None, 0]
    dy = src_pos[None, :, 1] - tgt_pos[:, None, 1]
    dist_sq = dx * dx + dy * dy
    # SOFTENING_FLOOR (types.py) is a (T,)-cost bias absorbed for any real
    # radius; it keeps a zero-gm source coincident with a radius-0 target at
    # exactly 0 instead of 0/0 -> NaN.
    r2 = dist_sq + (tgt_radius + SOFTENING_FLOOR)[:, None]
    if precise:
        f = src_gm[None, :] / (jnp.sqrt(r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        f = src_gm[None, :] * (inv * inv * inv)
    ax = jnp.sum(dx * f, axis=1)
    ay = jnp.sum(dy * f, axis=1)
    return jnp.stack([ax, ay], axis=-1).astype(DTYPE)


def direct_sum_acc(
    pos: jax.Array,
    radius: jax.Array,
    src_pos: jax.Array,
    src_gm: jax.Array,
    *,
    chunk: int | None = None,
    precise: bool = True,
) -> jax.Array:
    """Direct-sum acceleration with optional target chunking.

    Chunking bounds the O(T*S) intermediate to O(chunk*S) memory by scanning
    over target tiles; needed for large N on the jnp backend.
    """
    n = pos.shape[0]
    if chunk is None or chunk >= n:
        return pair_acc(pos, radius, src_pos, src_gm, precise=precise)
    if n % chunk != 0:
        raise ValueError(f"chunk {chunk} must divide padded N {n}")

    def one_tile(tile):
        tpos, trad = tile
        return pair_acc(tpos, trad, src_pos, src_gm, precise=precise)

    tiles = (pos.reshape(n // chunk, chunk, 2), radius.reshape(n // chunk, chunk))
    acc = jax.lax.map(one_tile, tiles)
    return acc.reshape(n, 2)


def acc_from_particles(
    pos: jax.Array,
    radius: jax.Array,
    mass: jax.Array,
    mass_len: int,
    *,
    chunk: int | None = None,
    precise: bool = True,
    g: float = G,
) -> jax.Array:
    """Convenience oracle: all particles as targets, first ``mass_len`` as
    sources (the massive-first partition invariant, world.c:33-46)."""
    src_pos = pos[:mass_len]
    src_gm = g * mass[:mass_len]
    return direct_sum_acc(pos, radius, src_pos, src_gm, chunk=chunk, precise=precise)


def checked_extra_acc(extra_force, pos, vel, *params):
    """Call a user ``extra_force(pos, vel, *params)`` hook and validate its
    output at trace time.

    Shapes are static under jit, so the check costs nothing at runtime; it
    exists because ``acc + wrong_shape`` would otherwise broadcast silently
    (e.g. a (N, 1) or scalar return corrupts physics without any error).
    """
    out = jnp.asarray(extra_force(pos, vel, *params), DTYPE)
    if out.shape != pos.shape:
        raise ValueError(
            "extra_force must return accelerations with the same shape as "
            f"pos {pos.shape}, got {out.shape}")
    return out


@jax.jit
def integrate(pos, vel, acc, dt):
    """Semi-implicit (symplectic) Euler, velocity first (sim_cpu.c:192-193,
    particle_cs.glsl:51-52): v += a*dt; x += v*dt."""
    vel = vel + dt * acc
    pos = pos + dt * vel
    return pos, vel
