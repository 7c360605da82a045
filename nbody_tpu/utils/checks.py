"""Debug validation: the TPU analogue of the reference's Vulkan validation
layers (vulkan_ctx.c:13-47, forced on in debug builds — SURVEY.md §5).

XLA owns memory-hazard correctness; what remains worth guarding is numerical
health (NaN/Inf from zero-softening corner cases) and state-shape invariants.
Opt-in, zero cost when unused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Particles


class SimulationDiverged(RuntimeError):
    pass


@jax.jit
def _health(state: Particles) -> jax.Array:
    """Single scalar: all-finite over every state leaf (device-side)."""
    leaves = [state.pos, state.vel, state.acc, state.mass, state.radius]
    ok = jnp.bool_(True)
    for leaf in leaves:
        ok = ok & jnp.isfinite(leaf).all()
    return ok


def check_state(state: Particles, context: str = "") -> None:
    """Raise SimulationDiverged if any state component is NaN/Inf.

    One device->host scalar transfer; call between update batches in debug
    runs (mirrors where the reference's validation layer would fire)."""
    if not bool(_health(state)):
        where = []
        host = jax.tree.map(np.asarray, state)
        for name in ("pos", "vel", "acc", "mass", "radius"):
            arr = getattr(host, name)
            bad = ~np.isfinite(arr)
            if bad.any():
                where.append(f"{name}: {int(bad.sum())} bad at rows {np.unique(np.nonzero(bad)[0])[:8].tolist()}")
        ctx = f" ({context})" if context else ""
        raise SimulationDiverged(f"non-finite simulation state{ctx}: " + "; ".join(where))


def validate_world_invariants(world) -> None:
    """Structural invariants of a World (debug assertion bundle).

    Under ``SimConfig.merge_collisions`` the massive-first partition
    weakens by design: absorbed bodies keep their row inside the prefix
    with ``mass == 0`` (``mass_len`` is an upper bound, ops/collisions.py),
    and ``gm`` must track ``g * mass`` through every merge."""
    host = world.particles
    m = np.asarray(host.mass)
    assert world.total_len == host.pos.shape[0]
    merging = getattr(world.config, "merge_collisions", False)
    # World carries the full-length gm row as .gm; ShardedWorld carries the
    # per-backend source row as .gm_src (src_len for the ring backends,
    # n_pad for pm/p3m) — the prefix invariants are identical.
    gm = np.asarray(world.gm if hasattr(world, "gm") else world.gm_src)
    if merging:
        assert np.all(m[: world.mass_len] >= 0), "negative mass in prefix"
        np.testing.assert_allclose(
            gm[: world.mass_len],
            world.config.g * m[: world.mass_len], rtol=1e-6,
            err_msg="gm row diverged from g*mass through a merge")
    else:
        assert np.all(m[: world.mass_len] > 0), \
            "massive-first partition violated"
    assert np.all(m[world.mass_len:] <= 0), "massive-first partition violated"
    assert np.all(gm[world.mass_len:] == 0), "gm mask leaks beyond mass_len"
    assert world.n_pad >= world.src_len >= world.mass_len


class CheckedWorld:
    """Proxy that validates state after every update — the 'debug build'."""

    def __init__(self, world):
        self._world = world

    def update(self, dt, n=1, backend=None, **kwargs):
        # ShardedWorld.update has no backend kwarg; only forward it when
        # given. Other kwargs (extra_force, ...) pass straight through.
        if backend is None:
            self._world.update(dt, n, **kwargs)
        else:
            self._world.update(dt, n, backend=backend, **kwargs)
        check_state(self._world.state, context=f"after update(dt={dt}, n={n})")
        return self

    def update_adaptive(self, t_span, **kwargs):
        # World.update_adaptive / ShardedWorld.update_adaptive
        n = self._world.update_adaptive(t_span, **kwargs)
        check_state(self._world.state,
                    context=f"after update_adaptive(t_span={t_span})")
        return n

    def __getattr__(self, name):
        return getattr(self._world, name)
