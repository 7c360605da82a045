#!/usr/bin/env python
"""Round-3 jnp-path micro-tuning: FMA reassociation of the softening add.

Current pair math (forces.pair_acc, precise=False), per (T,S) pair:
  dx, dy                  2 passes (mixed-shape subs)
  dist_sq = dx*dx+dy*dy   mul + FMA = 2
  r2 = dist_sq + rad      1 (mixed add)          <-- candidate
  inv = rsqrt(r2)         ~3.5 slots
  f  = gm*(inv*inv*inv)   3
  ax += dx*f; ay += dy*f  2 + reduce

The candidate folds the softening add into the FMA chain:
  r2 = dx*dx + (dy*dy + rad)   ->  FMA(dx,dx, FMA(dy,dy,rad_b)) = 2 passes
saving one full (T,S) elementwise pass per pair (~0.73 slots of ~16.3).

fp32 association changes by <=1 ulp per term; parity tests are
tolerance-based, and the precise=True oracle keeps reference order.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import nbody_tpu as nb

SEED = 11037
N = 65536
ITERS = 500
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pair_acc_v0(tgt_pos, tgt_radius, src_pos, src_gm):
    dx = src_pos[None, :, 0] - tgt_pos[:, None, 0]
    dy = src_pos[None, :, 1] - tgt_pos[:, None, 1]
    dist_sq = dx * dx + dy * dy
    r2 = dist_sq + tgt_radius[:, None]
    inv = jax.lax.rsqrt(r2)
    f = src_gm[None, :] * (inv * inv * inv)
    ax = jnp.sum(dx * f, axis=1)
    ay = jnp.sum(dy * f, axis=1)
    return jnp.stack([ax, ay], axis=-1)


def pair_acc_v1(tgt_pos, tgt_radius, src_pos, src_gm):
    dx = src_pos[None, :, 0] - tgt_pos[:, None, 0]
    dy = src_pos[None, :, 1] - tgt_pos[:, None, 1]
    r2 = dx * dx + (dy * dy + tgt_radius[:, None])
    inv = jax.lax.rsqrt(r2)
    f = src_gm[None, :] * (inv * inv * inv)
    ax = jnp.sum(dx * f, axis=1)
    ay = jnp.sum(dy * f, axis=1)
    return jnp.stack([ax, ay], axis=-1)


def pair_acc_v2(tgt_pos, tgt_radius, src_pos, src_gm):
    # v1 + reassociated f so the (1,S) gm broadcast multiplies first
    dx = src_pos[None, :, 0] - tgt_pos[:, None, 0]
    dy = src_pos[None, :, 1] - tgt_pos[:, None, 1]
    r2 = dx * dx + (dy * dy + tgt_radius[:, None])
    inv = jax.lax.rsqrt(r2)
    f = (src_gm[None, :] * inv) * (inv * inv)
    ax = jnp.sum(dx * f, axis=1)
    ay = jnp.sum(dy * f, axis=1)
    return jnp.stack([ax, ay], axis=-1)


def make_substep(pair_fn, chunk):
    def acc_fn(pos, radius, src_pos, src_gm):
        n = pos.shape[0]
        if chunk >= n:
            return pair_fn(pos, radius, src_pos, src_gm)
        tiles = (pos.reshape(n // chunk, chunk, 2),
                 radius.reshape(n // chunk, chunk))
        return jax.lax.map(
            lambda t: pair_fn(t[0], t[1], src_pos, src_gm), tiles
        ).reshape(n, 2)

    @functools.partial(jax.jit, static_argnames=("iters", "src_len"),
                       donate_argnums=(0, 1))
    def run(pos, vel, radius, gm, valid, dt, *, iters, src_len):
        def body(_, carry):
            pos, vel = carry
            acc = acc_fn(pos, radius, pos[:src_len], gm[:src_len]) * valid
            vel = vel + dt * acc
            pos = pos + dt * vel
            return pos, vel

        return jax.lax.fori_loop(0, iters, body, (pos, vel))

    return run


def main():
    scene = nb.make_galaxies(N, 2, seed=SEED)
    w = nb.create_world(scene)
    chunk = min(w.config.tile_targets, w.state.pos.shape[0])
    src_len = int(w.mass_len)
    log(f"N={N} mass_len={w.mass_len} chunk={chunk} "
        f"platform={jax.default_backend()}")

    variants = {"v0_current": pair_acc_v0, "v1_fma_soften": pair_acc_v1,
                "v2_fma_gm_first": pair_acc_v2}
    base = None
    for name, fn in variants.items():
        run = make_substep(fn, chunk)
        best = float("inf")
        for r in range(REPS):
            pos = jnp.array(w.state.pos)
            vel = jnp.array(w.state.vel)
            pos, vel = run(pos, vel, w.state.radius, w.gm, w.valid,
                           jnp.float32(1.0), iters=10 if r == 0 else 1,
                           src_len=src_len)
            jax.block_until_ready((pos, vel))
            pos = jnp.array(w.state.pos)
            vel = jnp.array(w.state.vel)
            t0 = time.perf_counter()
            pos, vel = run(pos, vel, w.state.radius, w.gm, w.valid,
                           jnp.float32(1.0), iters=ITERS, src_len=src_len)
            jax.block_until_ready((pos, vel))
            dt_us = (time.perf_counter() - t0) / ITERS * 1e6
            best = min(best, dt_us)
        rate = w.total_len * w.mass_len / (best / 1e6)
        if base is None:
            base = best
        log(f"{name:>18}: {best:9.1f} us/step  {rate:.3e} pairs/s  "
            f"({base / best - 1:+.1%} vs v0)")


if __name__ == "__main__":
    main()
