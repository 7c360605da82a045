#!/usr/bin/env python
"""Round-2 kernel experiments: exact-source handling + grid restructuring.

Variants at the N=65536 headline shape (T=65536 targets, S_real=32833):
  v0_padded   — round-1 kernel, sources padded to tile_sources (34816)
  v1_tail     — round-1 kernel on floor tiles + small tail kernel (S pad 128)
  v2_resident — grid over target tiles only; sources VMEM-resident (3,S) row,
                inner fori_loop over chunks + static tail chunk (S pad 128)
  jnp         — the round-1 default (exact sources, XLA fusion)

Each timed as 50 fused substeps (force + integrate) per call, best of 3.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu import forces
from nbody_tpu.ops.pallas_forces import pallas_acc
from nbody_tpu.types import DTYPE, round_up

SEED = 11037


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- v2 kernel
def _v2_kernel(tx_ref, ty_ref, tr_ref, src_ref, ax_ref, ay_ref,
               *, chunk: int, n_full: int, tail: int, precise: bool):
    tx = tx_ref[:]   # (TT, 1)
    ty = ty_ref[:]
    tr = tr_ref[:]

    def block(sx, sy, gm, ax, ay):
        dx = sx - tx
        dy = sy - ty
        r2 = dx * dx + dy * dy + tr
        if precise:
            f = gm / (jnp.sqrt(r2) * r2)
        else:
            inv = jax.lax.rsqrt(r2)
            f = gm * (inv * inv * inv)
        ax = ax + jnp.sum(dx * f, axis=1, keepdims=True)
        ay = ay + jnp.sum(dy * f, axis=1, keepdims=True)
        return ax, ay

    def body(j, carry):
        ax, ay = carry
        sx = src_ref[0:1, pl.ds(j * chunk, chunk)]
        sy = src_ref[1:2, pl.ds(j * chunk, chunk)]
        gm = src_ref[2:3, pl.ds(j * chunk, chunk)]
        return block(sx, sy, gm, ax, ay)

    zero = jnp.zeros_like(ax_ref)
    ax, ay = jax.lax.fori_loop(0, n_full, body, (zero, zero))
    if tail:
        off = n_full * chunk
        ax, ay = block(src_ref[0:1, pl.ds(off, tail)],
                       src_ref[1:2, pl.ds(off, tail)],
                       src_ref[2:3, pl.ds(off, tail)], ax, ay)
    ax_ref[:] = ax
    ay_ref[:] = ay


@functools.partial(jax.jit, static_argnames=("tile_t", "chunk", "precise"))
def v2_acc(tgt_pos, tgt_radius, src, *, tile_t=512, chunk=2048, precise=False):
    t = tgt_pos.shape[0]
    s = src.shape[1]
    chunk = min(chunk, s)
    n_full, tail = divmod(s, chunk)
    kernel = functools.partial(_v2_kernel, chunk=chunk, n_full=n_full,
                               tail=tail, precise=precise)
    tgt_spec = pl.BlockSpec((tile_t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    src_spec = pl.BlockSpec((3, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pairs = t * s
    cost = pl.CostEstimate(flops=13 * pairs, bytes_accessed=(3 * t + 3 * s + 2 * t) * 4,
                           transcendentals=pairs)
    ax, ay = pl.pallas_call(
        kernel,
        grid=(t // tile_t,),
        in_specs=[tgt_spec, tgt_spec, tgt_spec, src_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((t, 1), DTYPE)] * 2,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(tgt_pos[:, 0:1], tgt_pos[:, 1:2], tgt_radius[:, None], src)
    return jnp.concatenate([ax, ay], axis=1)


# ---------------------------------------------------------------- v1: tail call
def v1_acc(tgt_pos, tgt_radius, src_pos, src_gm, *, tile_t=512, tile_s=2048):
    s = src_pos.shape[0]
    floor = (s // tile_s) * tile_s
    acc = pallas_acc(tgt_pos, tgt_radius, src_pos[:floor], src_gm[:floor],
                     tile_targets=tile_t, tile_sources=tile_s)
    if floor < s:
        acc = acc + pallas_acc(tgt_pos, tgt_radius, src_pos[floor:], src_gm[floor:],
                               tile_targets=tile_t, tile_sources=128)
    return acc


# ---------------------------------------------------------------- harness
def make_inputs(n=65536):
    scene = nb.make_galaxies(n, 2, seed=SEED)
    w = nb.create_world(scene)
    host = jax.tree.map(np.asarray, w.state)
    mass_len = w.mass_len
    s128 = round_up(mass_len, 128)
    gm = np.asarray(w.gm)
    src = np.stack([host.pos[:s128, 0], host.pos[:s128, 1], gm[:s128]], axis=0)
    return w, jnp.asarray(src), s128


def time_substeps(step_fn, state0, iters=50, repeats=3):
    """step_fn: state -> state. Times `iters` fused substeps, best-of-repeats."""

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda _, s: step_fn(s), state)

    out = run(state0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state0))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6  # µs/substep


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    w, src, s128 = make_inputs(n)
    t = w.n_pad
    real_pairs = w.total_len * w.mass_len
    pos, vel = w.state.pos, w.state.vel
    radius, valid, gm = w.state.radius, w.valid, w.gm
    dt = jnp.float32(0.001)
    log(f"N={n} T_pad={t} mass_len={w.mass_len} S128={s128} S_tile={w.src_len}")

    def integrate(pos, vel, acc):
        acc = acc * valid
        vel = vel + dt * acc
        return pos + dt * vel, vel

    def mk_state():
        return (pos, vel)

    results = {}

    def bench(name, acc_fn):
        def step(state):
            p, v = state
            a = acc_fn(p)
            return integrate(p, v, a)
        try:
            us = time_substeps(step, mk_state())
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return
        rate = real_pairs / (us / 1e6)
        results[name] = rate
        log(f"{name:>28}: {us:9.1f} µs/substep  {rate:.3e} pairs/s")

    # jnp baseline (exact sources)
    bench("jnp(exact)", lambda p: forces.direct_sum_acc(
        p, radius, p[:w.mass_len], gm[:w.mass_len], chunk=512, precise=False))

    # v0: round-1 kernel, padded sources
    bench("v0_padded(512x2048)", lambda p: pallas_acc(
        p, radius, p[:w.src_len], gm[:w.src_len]))

    # v1: floor tiles + tail call
    bench("v1_tail(512x2048)", lambda p: v1_acc(
        p, radius, p[:s128], gm[:s128]))

    # v2: resident sources, exact chunks
    for tile_t in (512, 1024, 2048):
        for chunk in (512, 1024, 2048, 4096):
            def acc_fn(p, tile_t=tile_t, chunk=chunk):
                s = jnp.stack([p[:s128, 0], p[:s128, 1], gm[:s128]], axis=0)
                return v2_acc(p, radius, s, tile_t=tile_t, chunk=chunk)
            bench(f"v2_resident({tile_t}x{chunk})", acc_fn)

    best = max(results, key=results.get)
    log(f"\nbest: {best} at {results[best]:.3e} pairs/s")


if __name__ == "__main__":
    main()
