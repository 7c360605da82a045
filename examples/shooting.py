#!/usr/bin/env python
"""Differentiable shooting problem: optimize a probe's launch velocity so it
arrives at a target after flying through a three-body gravitational field —
gradient descent straight through the simulator (nbody_tpu.autodiff).

Usage: python examples/shooting.py [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.autodiff import rollout

# three suns + one massless probe (index 3)
pos = jnp.array([[0.0, 0.0], [300.0, 100.0], [150.0, -200.0], [-200.0, 0.0]], jnp.float32)
vel = jnp.zeros((4, 2), jnp.float32)
mass = jnp.array([1e6, 5e5, 8e5, 0.0], jnp.float32)
radius = jnp.array([5.0, 4.0, 4.0, 0.5], jnp.float32)
target = jnp.array([400.0, -100.0], jnp.float32)
N_STEPS, DT = 200, 0.02


@jax.jit
def loss_and_grad(v0):
    def loss(v0):
        v = vel.at[3].set(v0)
        p, _ = rollout(pos, v, mass, radius, jnp.float32(DT),
                       n_steps=N_STEPS, mass_len=3)
        return jnp.sum((p[3] - target) ** 2)

    return jax.value_and_grad(loss)(v0)


ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 200

v0 = jnp.array([10.0, 0.0], jnp.float32)
l, _ = loss_and_grad(v0)  # also defines l for the final print when ITERS=0
for k in range(ITERS):
    l, g = loss_and_grad(v0)
    v0 = v0 - 1e-3 * g
    if k % 25 == 0:
        print(f"iter {k:4d}  miss distance {float(jnp.sqrt(l)):10.3f}  v0 = {np.asarray(v0)}")
print(f"final miss distance: {float(jnp.sqrt(l)):.3f} (launch velocity {np.asarray(v0)})")
