#!/usr/bin/env python
"""Differentiable CONTROL: optimize a piecewise-constant thrust schedule so
a probe, launched at rest, reaches a target through a three-body field —
gradients flow through `autodiff.rollout`'s extra_force hook into the
control parameters (`extra_force_params`), not just the initial state
(compare examples/shooting.py, which optimizes the launch velocity).

The schedule is K constant-thrust segments, realized as K chained
rollouts inside one jitted loss — each segment's thrust vector is a leaf
of the differentiated parameter array, reached through
``extra_force(pos, vel, theta)``. A soft fuel penalty keeps the schedule
physical.

Usage: python examples/thrust_control.py [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.autodiff import rollout

# three suns + one massless probe (index 3), launched AT REST: only the
# thrust schedule can steer it
pos0 = jnp.array([[0.0, 0.0], [300.0, 100.0], [150.0, -200.0],
                  [-200.0, 0.0]], jnp.float32)
vel0 = jnp.zeros((4, 2), jnp.float32)
mass = jnp.array([1e6, 5e5, 8e5, 0.0], jnp.float32)
radius = jnp.array([5.0, 4.0, 4.0, 0.5], jnp.float32)
target = jnp.array([400.0, -100.0], jnp.float32)
SEGMENTS, STEPS_PER_SEG, DT = 4, 50, 0.02
PROBE = 3


def thrust(p, v, theta):
    # accelerate only the probe (row PROBE) by the segment's thrust vector
    return jnp.zeros_like(p).at[PROBE].set(theta)


@jax.jit
def loss_and_grad(schedule):            # (SEGMENTS, 2)
    def loss(schedule):
        p, v = pos0, vel0
        for k in range(SEGMENTS):
            p, v = rollout(p, v, mass, radius, jnp.float32(DT),
                           n_steps=STEPS_PER_SEG, mass_len=3,
                           extra_force=thrust,
                           extra_force_params=schedule[k])
            # fuel cost keeps the schedule physical (soft penalty)
        return (jnp.sum((p[PROBE] - target) ** 2)
                + 1.0 * jnp.sum(schedule ** 2))

    return jax.value_and_grad(loss)(schedule)


ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 150

schedule = jnp.zeros((SEGMENTS, 2), jnp.float32)
l, _ = loss_and_grad(schedule)
for k in range(ITERS):
    l, g = loss_and_grad(schedule)
    schedule = schedule - 5e-4 * g
    if k % 25 == 0:
        print(f"iter {k:4d}  miss ~{float(jnp.sqrt(l)):10.2f}")
final_miss = float(jnp.sqrt(jnp.maximum(
    l - 1.0 * jnp.sum(schedule ** 2), 0.0)))
print(f"final miss distance: {final_miss:.2f}")
print("thrust schedule (ax, ay per segment):")
print(np.asarray(schedule))
