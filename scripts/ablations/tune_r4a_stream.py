#!/usr/bin/env python
"""Round-4 A/B: in-kernel DMA source streaming (pallas_forces v3) vs the
jnp backend, at the sizes where the round-3 grid-streamed form lost
(262k: -0.8%, 1M: -9%; docs/BENCHMARKS.md). Also a compiled-Mosaic
correctness check of the new DMA path (monkeypatched residency threshold,
so the streaming kernel runs at a small, fast size on the real chip).

Run: python -u scripts/ablations/tune_r4a_stream.py [N ...]   (on TPU)
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
import nbody_tpu as nb
from nbody_tpu import forces
from nbody_tpu.ops import pallas_forces as pf

# --- correctness of the compiled streaming kernel (small, forced) -------
old = pf.RESIDENT_SOURCE_MAX
pf.RESIDENT_SOURCE_MAX = 512
try:
    rng = np.random.RandomState(7)
    t = 2048
    pos = jnp.asarray(rng.randn(t, 2) * 50, jnp.float32)
    rad = jnp.asarray(np.abs(rng.randn(t)) + 0.5, jnp.float32)
    # Coverage of the v5 second-grid-dim streaming (chunk=2048, block
    # 32768): single partial block; multi-block scratch-accumulator carry;
    # static-last-block chunk skipping via src_real (uniform and shorter).
    for s, real in ((4096, None), (4096, 2000), (65536, None),
                    (65536, 40000), (98304, 70000)):
        gm_np = np.abs(rng.randn(s)) * 10
        if real is not None:
            gm_np[real:] = 0.0  # padding rows must be inert
        gm = jnp.asarray(gm_np, jnp.float32)
        src = jnp.asarray(rng.randn(s, 2) * 50, jnp.float32)
        want = np.asarray(forces.direct_sum_acc(pos, rad, src, gm,
                                                precise=False))
        got = np.asarray(pf.pallas_acc(pos, rad, src, gm, tile_sources=2048,
                                       src_real=real))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)
        print(f"streaming correctness S={s} real={real}: OK", flush=True)
finally:
    pf.RESIDENT_SOURCE_MAX = old

# --- perf A/B ------------------------------------------------------------
DT = 0.005
NS = [int(a) for a in sys.argv[1:]] or [262_144, 1_048_576]

for n in NS:
    steps = 32 if n <= 400_000 else 8
    scene = nb.make_galaxies(n, 2, seed=11037)
    row = {}
    for backend in ("jnp", "pallas"):
        w = nb.create_world(scene, default_backend=backend)
        w.update(DT, 2)
        w.block_until_ready()  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            w.update(DT, steps)
            w.block_until_ready()
            best = min(best, (time.perf_counter() - t0) * 1e3 / steps)
        row[backend] = best
        mass_len = w.mass_len
        del w
    pairs = n * mass_len
    gap = (row["pallas"] - row["jnp"]) / row["jnp"] * 100
    print(f"N={n:8d} (S={mass_len}): jnp {row['jnp']:9.1f} ms  "
          f"pallas {row['pallas']:9.1f} ms  ({gap:+.1f}%)  "
          f"[{pairs / row['jnp'] * 1e3 / 1e11:.2f}e11 pairs/s jnp]",
          flush=True)
