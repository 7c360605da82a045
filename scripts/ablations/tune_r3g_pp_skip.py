#!/usr/bin/env python
"""Round-3 PP occupancy experiment: chunked lax.map + lax.cond empty-skip.

The p3m PP pair stage costs gc²·9·cap² pair evaluations REGARDLESS of
occupancy (DESIGN.md §8) — ~17 ms at N=1M — because the current lax.map
iterates full gc-rows and galaxy scenes are clusters: at N=1M/4 galaxies
(grid=512, gc=128) only ~15% of cells are active, but ~72% of full rows
contain at least one active cell, so row granularity can't skip much.

lax.map lowers to a sequential scan, so a lax.cond inside the body is a
REAL branch (unlike under vmap). Chunking the map at B cells per iteration
(gc² % B == 0) and skipping chunks with no targets or no candidate sources
trades scan-iteration overhead against skipped pair math:

  B=None : production row map (baseline)
  B=16   : 1024 iterations at gc=128; ~23% active on the 1M/4-gal scene
  B=32/64/128: coarser — fewer iterations, lower skip fraction

Timed via the in-jit K-loop protocol (carried scalar dependency, RTT-
subtracted by construction, same-session A/B only).

Run: python -u scripts/ablations/tune_r3g_pp_skip.py [scene_idx [chunks...]]
(on TPU; one scene at a time survives tunnel wedges — each compile is
~30-60 s over the tunnel, so a full scene is ~5-10 min)
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

from nbody_tpu.galaxy import make_galaxies
from nbody_tpu.ops.p3m_forces import (_cell_pack, _pack_source_blocks,
                                      _pp_apply)
from nbody_tpu.ops.pm_forces import _bounds, _box

K = 8
GRID, RC = 512, 4
GC = GRID // RC
CAP = 96


def kloop(piece, x, k=K):
    @jax.jit
    def run(x):
        def body(i, s):
            return s + piece(x + 1e-18 * s).sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    float(run(x)); t0 = time.perf_counter(); float(run(x))
    return (time.perf_counter() - t0) * 1e3 / k


def pp_time(pos, radius, gm, chunk):
    sg = jax.lax.stop_gradient
    all_min, all_max = _bounds(sg(pos), sg(pos), sg(gm), None)
    lo, h = _box(all_min, all_max, GRID)
    rc = RC * h
    cell = (GRID * h) / GC
    inv_c = 1.0 / cell

    def piece(p):
        blocks = _pack_source_blocks(p, gm, lo, inv_c, GC, CAP)
        order_t, cid_t, rank_t, counts_t = _cell_pack(p, lo, inv_c, GC)
        return _pp_apply(p, radius, blocks, order_t, cid_t, rank_t,
                         counts_t, rank_t, GC, CAP, rc, jnp.float32(4.0),
                         False, chunk=chunk)
    return kloop(piece, pos)


def pp_once(pos, radius, gm, chunk):
    sg = jax.lax.stop_gradient
    all_min, all_max = _bounds(sg(pos), sg(pos), sg(gm), None)
    lo, h = _box(all_min, all_max, GRID)
    rc = RC * h
    inv_c = GC / (GRID * h)

    @jax.jit
    def f(p):
        blocks = _pack_source_blocks(p, gm, lo, inv_c, GC, CAP)
        order_t, cid_t, rank_t, counts_t = _cell_pack(p, lo, inv_c, GC)
        return _pp_apply(p, radius, blocks, order_t, cid_t, rank_t,
                         counts_t, rank_t, GC, CAP, rc, jnp.float32(4.0),
                         False, chunk=chunk)
    return np.asarray(f(pos))


SCENES = [(1_000_000, 4), (262_144, 3), (1_000_000, 1)]
pick = [int(sys.argv[1])] if len(sys.argv) > 1 else range(len(SCENES))
CHUNKS = ([int(c) for c in sys.argv[2:]] if len(sys.argv) > 2
          else (16, 32, 64, 128))

for n, ngal in (SCENES[i] for i in pick):
    scene = make_galaxies(n, ngal, seed=1)
    pos = jnp.asarray(scene.pos)
    radius = jnp.asarray(scene.radius)
    gm = jnp.asarray(10.0 * scene.mass)

    ref = pp_once(pos, radius, gm, None)
    got = pp_once(pos, radius, gm, 16)
    scale = np.abs(ref).max() + 1e-30
    err = np.abs(got - ref).max() / scale
    assert err < 1e-6, f"chunked PP parity broke: {err}"

    base = pp_time(pos, radius, gm, None)
    print(f"N={n} ngal={ngal}: PP stage row-map baseline {base:.1f} ms "
          f"(chunk parity rel-err {err:.1e})", flush=True)
    for b in CHUNKS:
        t = pp_time(pos, radius, gm, b)
        print(f"  chunk={b:4d}: {t:.1f} ms  ({base / t:.2f}x)", flush=True)
