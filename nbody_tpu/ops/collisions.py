"""Perfectly inelastic collision merging (opt-in; no reference counterpart).

When two massive bodies overlap (``|d| < factor * (r_i + r_j)``), the
lighter merges into the heavier: mass and momentum transfer exactly, the
merged body sits at the pair's center of mass, and radii combine
volume-additively (``r³`` sums — consistent with the scene generator's
``m = 4πρ/3 · r³`` law, galaxy.h:21-24). The absorbed body becomes a
massless tracer riding at the merged velocity.

TPU-native design constraints drive the whole shape of this module:

* **Static shapes.** Nothing is ever removed from the arrays; an absorbed
  body keeps its row with ``mass = 0``. Zero-mass sources already
  contribute exactly zero force in every backend (the padding rule), so
  ``mass_len`` remains a valid *upper bound* on force-exerting rows and no
  kernel shape changes.
* **One winner per loser, no chains.** All contacts are resolved
  simultaneously per substep: a body that has a heavier contact (a
  "loser") merges into its heaviest contacting partner — but only if that
  partner is not itself a loser this substep. A chain A < B < C in mutual
  contact therefore merges B→C this substep and A→C the next, which keeps
  the scatter conflict-free (a winner is never zeroed in the same pass)
  and conserves mass/momentum exactly.
* **Mask arithmetic, no data-dependent control flow.** The pair pass is a
  chunked O(M²) mask reduction over the massive prefix (same tiling idiom
  as forces.direct_sum_acc); merging is a pair of masked scatter-adds.

``gm`` (the G-premultiplied source-mass row every backend reads) becomes
carried state under merging — world.update_state_merging threads it
through the substep loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_pass(pos, vel, radius, mass, gm, *, factor: float, g: float,
               chunk: int = 512):
    """One simultaneous merge resolution over the massive prefix.

    ``pos/vel/radius/mass`` are the padded full-length (n_pad) rows; ``gm``
    is the source row (length src_len, or n_pad for the mesh backends) and
    ``gm > 0`` defines the live massive set — only those rows can absorb
    or be absorbed. Returns (pos, vel, radius, mass, gm) with this
    substep's merges applied; rows past the source length are untouched.
    """
    m = gm.shape[0]
    # Pad the working set to a chunk multiple so the tile pass is always
    # O(chunk * M) memory (the old fallback `chunk = m` materialized an
    # (M, M, 2) distance cube for any M not divisible by chunk). Padded
    # rows have gm = 0 -> never live, never contact, scatter to themselves.
    chunk = min(chunk, m)
    pad = -m % chunk
    mp = m + pad

    def padded(a, fill=0.0):
        width = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a[:m], width, constant_values=fill)

    live = padded(gm) > 0.0              # live massive bodies (sources)
    mass_m = padded(mass)
    pos_m = padded(pos)
    rad_m = padded(radius)
    idx = jnp.arange(mp)

    # Absorption priority: heavier wins; equal masses -> lower index wins.
    # Encoded as a strict-ordering key so "j beats i" is antisymmetric.
    def beats(mass_j, j, mass_i, i):
        return (mass_j > mass_i) | ((mass_j == mass_i) & (j < i))

    # Chunked pass over targets: for each live body i, find the heaviest
    # live body j in contact that beats i (None -> i survives).
    def one_tile(tile):
        tpos, trad, tmass, tidx, tlive = tile
        d = tpos[:, None, :] - pos_m[None, :, :]          # (c, mp, 2)
        d2 = (d * d).sum(-1)
        reach = factor * (trad[:, None] + rad_m[None, :])
        contact = (d2 < reach * reach) & tlive[:, None] & live[None, :] \
            & (tidx[:, None] != idx[None, :]) \
            & beats(mass_m[None, :], idx[None, :],
                    tmass[:, None], tidx[:, None])
        # heaviest beating contact, ties to the lower index (matches
        # `beats`): maximize (mass, -index) lexicographically
        key = jnp.where(contact, mass_m[None, :], -jnp.inf)
        best = key.max(axis=1)
        # among max-mass candidates pick the lowest index
        at_best = contact & (key == best[:, None])
        win = jnp.where(at_best, idx[None, :], mp).min(axis=1)
        return best > -jnp.inf, win

    tiles = (pos_m.reshape(-1, chunk, 2), rad_m.reshape(-1, chunk),
             mass_m.reshape(-1, chunk), idx.reshape(-1, chunk),
             live.reshape(-1, chunk))
    is_loser, winner = jax.lax.map(one_tile, tiles)
    is_loser = is_loser.reshape(mp)
    winner = winner.reshape(mp)

    # a loser merges only into a non-loser (defers chains one substep)
    ok = is_loser & ~is_loser[jnp.where(winner < mp, winner, 0)]
    w = jnp.where(ok, winner, idx)       # self-scatter = no-op rows

    dm = jnp.where(ok, mass_m, 0.0)
    vel_m = padded(vel)
    new_mass = mass_m.at[w].add(dm)
    # momentum- and center-of-mass-conserving combine
    mom = mass_m[:, None] * vel_m
    mx = mass_m[:, None] * pos_m
    new_mom = mom.at[w].add(jnp.where(ok[:, None], mom, 0.0))
    new_mx = mx.at[w].add(jnp.where(ok[:, None], mx, 0.0))
    r3 = rad_m ** 3
    new_r3 = r3.at[w].add(jnp.where(ok, r3, 0.0))

    absorbed_into = jnp.where(ok, w, idx)
    # winners that absorbed someone (counted, not inferred from fp sums)
    grew = jnp.zeros(mp, jnp.int32).at[w].add(ok.astype(jnp.int32)) > 0
    safe = jnp.maximum(new_mass, 1e-30)[:, None]
    pos_w = jnp.where(grew[:, None], new_mx / safe, pos_m)
    vel_w = jnp.where(grew[:, None], new_mom / safe, vel_m)
    rad_w = jnp.where(grew, new_r3 ** (1.0 / 3.0), rad_m)

    # absorbed rows: massless tracer at the merged body's state
    TRACER_RADIUS = 0.5                  # galaxy.c:205-206 semantics
    out_mass = jnp.where(ok, 0.0, new_mass)
    out_pos = jnp.where(ok[:, None], pos_w[absorbed_into], pos_w)
    out_vel = jnp.where(ok[:, None], vel_w[absorbed_into], vel_w)
    out_rad = jnp.where(ok, TRACER_RADIUS, rad_w)
    out_gm = jnp.where(live[:m], g * out_mass[:m], gm)  # absorbed rows: 0

    return (pos.at[:m].set(out_pos[:m]), vel.at[:m].set(out_vel[:m]),
            radius.at[:m].set(out_rad[:m]), mass.at[:m].set(out_mass[:m]),
            out_gm)
