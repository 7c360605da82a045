#!/usr/bin/env python
# Round-3 CIC-gather ablation (negative result recorded in DESIGN.md par.8):
# the 4-corner bilinear gather is XLA-gather-throughput bound; combining the
# corners into one 4M-index gather changes nothing and a vmapped 2x2
# dynamic-slice patch fetch is 40x slower.
import sys; sys.path.insert(0, ".")
import time, jax, jax.numpy as jnp, numpy as np
import nbody_tpu as nb
from nbody_tpu.ops.pm_forces import _bounds, _box, _cic_scatter, _solve, _cic_gather, _cic_weights

scene = nb.make_galaxies(1_000_000, 2, seed=11037)
w = nb.create_world(scene)
pos0 = w.state.pos; grid = 512
ml = w.mass_len; gm = w.gm[:ml]
lo0, h0 = jax.jit(lambda p: _box(*_bounds(p, p[:ml], gm, None), grid))(pos0)
AG = jax.jit(lambda p: _solve(_cic_scatter(p[:ml], gm, lo0, 1.0/h0, grid), h0, jnp.float32(4.0), grid))(pos0)
jax.block_until_ready(AG)
K = 10

def kloop(piece, arg):
    @jax.jit
    def run(x):
        def body(i, s):
            return s + piece(x + 1e-18 * s).sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    float(run(arg))
    t0 = time.perf_counter(); float(run(arg)); t1 = time.perf_counter()
    return (t1 - t0) * 1e3 / K

# current: 4 corner gathers of (1M, 2)
print(f"current 4-corner: {kloop(lambda p: _cic_gather(AG, p, lo0, 1.0/h0, grid), pos0):.1f} ms", flush=True)

# variant A: one combined gather with 4M flat indices
AGF = AG.reshape(grid*grid, 2)
def gather_combined(p):
    i0, j0, wx, wy = _cic_weights(p, lo0, 1.0/h0, grid)
    base = i0 * grid + j0
    idx = jnp.concatenate([base, base + grid, base + 1, base + grid + 1])
    vals = AGF[idx].reshape(4, -1, 2)
    w00 = (1-wx)*(1-wy); w10 = wx*(1-wy); w01 = (1-wx)*wy; w11 = wx*wy
    return (w00[:,None]*vals[0] + w10[:,None]*vals[1]
            + w01[:,None]*vals[2] + w11[:,None]*vals[3]).astype(jnp.float32)
print(f"combined 1-gather: {kloop(gather_combined, pos0):.1f} ms", flush=True)

# variant B: 2x2 patch slice gather (slice_sizes trick via dynamic_slice gather)
def gather_patch(p):
    i0, j0, wx, wy = _cic_weights(p, lo0, 1.0/h0, grid)
    starts = jnp.stack([i0, j0], axis=-1)
    patch = jax.vmap(lambda s: jax.lax.dynamic_slice(AG, (s[0], s[1], 0), (2, 2, 2)))(starts)
    w = jnp.stack([(1-wx)*(1-wy), (1-wx)*wy, wx*(1-wy), wx*wy], -1).reshape(-1, 2, 2)
    return jnp.einsum("nij,nijc->nc", w, patch).astype(jnp.float32)
print(f"patch slice:      {kloop(gather_patch, pos0):.1f} ms", flush=True)

# check parity of variant A
a = np.asarray(jax.jit(lambda p: _cic_gather(AG, p, lo0, 1.0/h0, grid))(pos0))
b = np.asarray(jax.jit(gather_combined)(pos0))
print("A parity:", np.abs(a-b).max() / max(1e-30, np.abs(a).max()), flush=True)
