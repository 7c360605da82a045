"""World: particle state container + backend mux + step functions.

TPU-native counterpart of the reference's ``src/lib/world.c`` and the public
API of ``include/nbody.h:61-73`` (CreateWorld / GetWorldParticles /
UpdateWorld_CPU / UpdateWorld_GPU).

Architectural translation:
  * The reference keeps a host array + GPU buffers with lazy bidirectional
    dirty-flag sync (world.c:18-19, 76-89). Here state is a single
    device-resident SoA pytree; "sync" collapses to an explicit, cached
    ``jax.device_get`` when the host asks for particles.
  * The massive-before-massless partition (world.c:33-46, unstable two-pointer
    swap) becomes a *stable* argsort on ``mass <= 0`` — same invariant (all
    force-exerting particles first), deterministic order.
  * ``UpdateWorld_*(w, dt, n)``'s n-substep batching (the GPU dispatch chain,
    sim_gpu.c:314-333) becomes a ``lax.fori_loop`` inside one jitted call with
    a *traced* n — one compilation serves every (dt, n), and buffer donation
    gives the double-buffer reuse of storage[0]/storage[1] (sim_gpu.c:19).
  * Backends: ``jnp`` (vectorized direct sum, the CPU-path analogue of
    sim_cpu.c) and ``pallas`` (tiled TPU kernel, the GPU-path analogue of
    particle_cs.glsl). Both operate on the same device state, so switching is
    free — the reference's TAB-switch semantics (main.c:112-116) without the
    copies.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from . import forces, integrators
from .ops.pallas_forces import (
    RESIDENT_SOURCE_MAX,
    SOURCE_ALIGN,
    fused_substep,
    pallas_acc,
)
from .types import (
    DEFAULT_SIM_CONFIG,
    Particles,
    SimConfig,
    pad_to_tiles,
    round_up,
)

Backend = Literal["jnp", "pallas", "pallas_fused", "pm", "p3m", "auto"]


# Measured on TPU v5e (docs/BENCHMARKS.md, docs/DESIGN.md §3): the round-2
# fused Pallas kernel (exact mass_len sources, one launch per substep,
# streamed sources at huge N) runs within ~1-5% of the XLA-fused jnp path at
# 50k-262k but never ahead of it in same-run comparisons, so jnp remains the
# default at every size. Both paths are elementwise-bound at the same VPU
# ceiling; XLA's fusion avoids ~1 broadcast-materialization pass per pair
# that Mosaic pays. (The reference's analogous heuristic: GPU above N ~ 500,
# main.c:55.)
PALLAS_CROSSOVER_N = None  # no measured size where the kernel leads


def default_backend_for(n: int) -> "Backend":
    if PALLAS_CROSSOVER_N is None:
        return "jnp"
    return "pallas" if n >= PALLAS_CROSSOVER_N else "jnp"


# The scale mux that DID materialize (the reference's own heuristic axis,
# main.c:55: CPU below N ~ 500, GPU above): exact direct sum costs
# total_len*mass_len pair evaluations per substep at the VPU ceiling
# (~2.4e11 pairs/s/chip), while p3m delivers near-exact accuracy
# (|Δa|/|a| ~ 5e-4 at horizon, docs/BENCHMARKS.md) in roughly linear time
# plus a fixed mesh cost. Bracketed by the v5e BENCHMARKS rows at default
# config (direct sum 8.8 ms at N=65k vs p3m 73 ms at 262k where direct
# costs 140 ms); the break-even is pinned same-session by
# scripts/ablations/tune_r3h_crossover.py. "auto" picks direct sum at or below this
# pair count, p3m above.
AUTO_P3M_MIN_PAIRS = 16_000_000_000


def resolve_backend(backend: "Backend", total_len: int,
                    mass_len: int, *, merging: bool = False,
                    rebin_interval: int = 1) -> "Backend":
    """Resolve ``"auto"`` to the faster backend of equivalent accuracy at
    this problem size; every concrete backend passes through unchanged.
    Under ``merging`` (SimConfig.merge_collisions) p3m remains the
    above-crossover choice at the default ``p3m_rebin_interval == 1``
    (bins rebuild every substep, so the carried gm/radius feed each build
    fresh — see :func:`merging_substep_fn`); only with ``rebin_interval >
    1`` do frozen cell blocks genuinely conflict with mid-loop mass
    changes, and ``pm`` — merge-capable at any interval — is picked
    instead."""
    if backend != "auto":
        return backend
    if total_len * mass_len <= AUTO_P3M_MIN_PAIRS:
        return "jnp"
    return "pm" if (merging and rebin_interval > 1) else "p3m"


def source_pad_len(mass_len: int, tile_sources: int) -> int:
    """Padded source-row length for the Pallas kernels.

    Resident sources need only the 128-lane alignment (exact-source
    semantics, particle_cs.glsl:35); streamed sources (beyond the VMEM
    residency budget) pad to the chunk (tile_sources) — the kernel splits
    S into evenly-sized stream blocks itself and skips all gm=0 padding
    compute via the static real source count (src_real)."""
    if mass_len <= max(RESIDENT_SOURCE_MAX, tile_sources):
        return round_up(max(mass_len, 1), SOURCE_ALIGN)
    return round_up(mass_len, tile_sources)


def partition_massive_first(mass: np.ndarray) -> tuple[np.ndarray, int]:
    """Return (permutation, mass_len): indices reordering particles so all
    with mass > 0 come first (world.c:33-46). Stable within each group."""
    mass = np.asarray(mass)
    order = np.argsort(mass <= 0, kind="stable")
    mass_len = int(np.count_nonzero(mass > 0))
    return order, mass_len


@functools.partial(jax.jit, static_argnames=("n_pad", "g"))
def _create_padded_state(
    pos, vel, acc, mass, radius, mass_len, *, n_pad: int, g: float
):
    """Device-side world creation: stable massive-first partition
    (world.c:33-46 as a jitted argsort on ``mass <= 0``), padding to kernel
    shapes, and gm/valid row synthesis — no host round trip. ``mass_len`` is
    traced, so one compilation serves every scene of a given size."""
    n = pos.shape[0]
    order = jnp.argsort(mass <= 0, stable=True)

    def pad(a, fill):
        out = jnp.full((n_pad,) + a.shape[1:], jnp.float32(fill))
        return jax.lax.dynamic_update_slice(
            out, a[order].astype(jnp.float32), (0,) * out.ndim)

    state = Particles(
        pos=pad(pos, 0.0),
        vel=pad(vel, 0.0),
        acc=pad(acc, 0.0),
        mass=pad(mass, 0.0),
        radius=pad(radius, 1.0),
    )
    idx = jnp.arange(n_pad)
    gm = jnp.where(idx < mass_len, g * state.mass, 0.0).astype(jnp.float32)
    valid = (idx < n).astype(jnp.float32)[:, None]
    return state, gm, valid


def _step(
    state: Particles,
    gm: jax.Array,
    valid: jax.Array,
    dt: jax.Array,
    *,
    src_len: int,
    src_real: int | None = None,
    config: SimConfig,
    backend: Backend,
    interpret: bool | None,
    p3m_bins=None,
    extra_force=None,
) -> Particles:
    """One substep: force + semi-implicit Euler. Jacobi snapshot semantics —
    all targets see the same pre-step source positions (the reference's
    re-pack-per-substep / double-buffer rule, world.c:101-107, sim_gpu.c:19)
    hold automatically since ``state.pos`` is read once, functionally.

    ``extra_force(pos, vel) -> acc`` (optional) adds a user acceleration
    field — external potentials, drag, thrust — on top of self-gravity,
    applied to every real particle (massless tracers included). ``vel`` is
    the substep-entry velocity; for multi-stage integrators the hook sees
    the same vel at every stage (a velocity-dependent hook breaks strict
    symplecticity anyway). With a hook, the pallas backends route through
    the generic stage loop (force kernel + hook + integrate) instead of the
    fused in-kernel integration."""
    ws = integrators.stage_weights(config.integrator)
    if backend in ("pallas", "pallas_fused") and extra_force is None:
        # whole substep (force + integrate) in ONE kernel launch per DKD
        # stage (ops/pallas_forces.fused_substep). "pallas_fused" is an
        # alias — since round 2 the flagship kernel integrates in-kernel
        # natively. Euler = 1 launch; leapfrog = 1 (half-drift outside,
        # kick + half-drift inside, pos_dt=0.5); yoshida4 = 3 weighted
        # DKD launches (integrators.stage_weights).
        pos, vel, acc = state.pos, state.vel, state.acc
        for w in (1.0,) if ws is None else ws:
            dtk = dt if w == 1.0 else w * dt
            pos_in = pos if ws is None else pos + (0.5 * dtk) * vel
            src = jnp.concatenate(
                [jnp.transpose(pos_in[:src_len]), gm[None, :src_len]], axis=0)
            pos, vel, acc = fused_substep(
                dtk, pos_in, vel, state.radius, valid, src,
                tile_targets=config.kernel_tile_targets,
                tile_sources=config.tile_sources,
                precise=config.precise,
                pos_dt=1.0 if ws is None else 0.5,
                interpret=interpret,
                src_real=src_real,
            )
        return Particles(pos=pos, vel=vel, acc=acc,
                         mass=state.mass, radius=state.radius)

    # Padding rows stay identically zero under Euler (replaces the shader's
    # `if (i >= total_len) return` guard, particle_cs.glsl:30); the valid
    # mask inside the force closure keeps that true for every DKD stage.
    # p3m frozen bins (if any) are shared by all stages of a substep — the
    # rebin drift bound already covers intra-substep stage motion.
    def force_at(p):
        at = Particles(pos=p, vel=state.vel, acc=state.acc,
                       mass=state.mass, radius=state.radius)
        acc = _force(at, gm, src_len=src_len, src_real=src_real,
                     config=config, backend=backend, interpret=interpret,
                     valid=valid, p3m_bins=p3m_bins)
        if extra_force is not None:
            acc = acc + forces.checked_extra_acc(extra_force, p, state.vel)
        return acc * valid

    pos, vel, acc = integrators.advance(
        config.integrator, force_at, state.pos, state.vel, dt)
    return Particles(pos=pos, vel=vel, acc=acc, mass=state.mass, radius=state.radius)


def _force(
    state: Particles,
    gm: jax.Array,
    *,
    src_len: int,
    src_real: int | None = None,
    config: SimConfig,
    backend: Backend,
    interpret: bool | None,
    valid: jax.Array | None = None,
    p3m_bins=None,
) -> jax.Array:
    """Backend-dispatched direct-sum acceleration (unmasked)."""
    src_pos = state.pos[:src_len]
    src_gm = gm[:src_len]
    if backend in ("pallas", "pallas_fused"):
        return pallas_acc(
            state.pos,
            state.radius,
            src_pos,
            src_gm,
            tile_targets=config.kernel_tile_targets,
            tile_sources=config.tile_sources,
            precise=config.precise,
            interpret=interpret,
            src_real=src_real,
        )
    if backend == "jnp":
        chunk = min(config.tile_targets, state.n)
        return forces.direct_sum_acc(
            state.pos, state.radius, src_pos, src_gm,
            chunk=chunk, precise=config.precise,
        )
    if backend == "pm":
        # particle-mesh far field: O(N + G^2 log G); approximate (global
        # softening instead of the per-target radius term) — opt-in for
        # very large N (ops/pm_forces.py)
        from .ops.pm_forces import pm_acc

        return pm_acc(state.pos, src_pos, src_gm,
                      softening=config.pm_softening, grid=config.pm_grid,
                      tgt_mask=valid)
    if backend == "p3m":
        # P³M: PM far field + exact short-range pair correction + exact
        # rows for the largest-softening targets — accurate at all ranges,
        # still O(N) (ops/p3m_forces.py)
        if p3m_bins is not None:
            # frozen spatial structure (p3m_rebin_interval > 1): reuse the
            # carried bins; positions stay exact through the orders
            from .ops.p3m_forces import p3m_acc_from_bins

            return p3m_acc_from_bins(
                p3m_bins, state.pos, state.radius, src_pos, src_gm,
                softening=config.pm_softening, grid=config.pm_grid,
                rc_cells=config.p3m_rc_cells,
                cell_capacity=config.p3m_cell_capacity,
                precise=config.precise,
                pp_chunk=config.p3m_pp_chunk or None,
                pp_compact=config.p3m_pp_compact or None)
        from .ops.p3m_forces import p3m_acc

        return p3m_acc(state.pos, state.radius, src_pos, src_gm,
                       softening=config.pm_softening, grid=config.pm_grid,
                       rc_cells=config.p3m_rc_cells,
                       cell_capacity=config.p3m_cell_capacity,
                       exact_targets=config.p3m_exact_targets,
                       precise=config.precise, tgt_mask=valid,
                       pp_chunk=config.p3m_pp_chunk or None,
                       pp_compact=config.p3m_pp_compact or None)
    raise ValueError(f"unknown backend {backend!r}")


def effective_src_len(backend: Backend, src_len: int, mass_len: int) -> int:
    """Source rows actually fed to the backend: the jnp backend slices
    exactly ``mass_len`` (no alignment requirement); the round-2 Pallas
    kernel needs only the 128-lane alignment (``src_len`` already satisfies
    the streaming-block rule when sources exceed the residency budget)."""
    if backend in ("jnp", "pm", "p3m"):
        return max(mass_len, 1)
    return src_len


def p3m_bins_builder(state: Particles, gm, valid, *, src_len: int,
                     config: SimConfig):
    """Constructor for the frozen P³M spatial structure with the
    position-independent exact-core selection hoisted (top_k over the
    CONSTANT radius runs once, not per rebuild). Shared by
    :func:`update_state` and trajectory capture (``trajectory.record_states``)
    so both honor ``p3m_rebin_interval`` identically."""
    from .ops.p3m_forces import _masked_radius
    from .ops.p3m_forces import p3m_bins as _make_bins

    kk = min(config.p3m_exact_targets, state.pos.shape[0])
    # selection key masks padding rows (-inf) so they never displace
    # real low-radius targets from exact treatment
    _, big0 = jax.lax.top_k(_masked_radius(state.radius, valid), kk)

    def bins_of(st):
        return _make_bins(
            st.pos, st.radius, st.pos[:src_len], gm[:src_len],
            grid=config.pm_grid, rc_cells=config.p3m_rc_cells,
            exact_targets=config.p3m_exact_targets, tgt_mask=valid,
            big=big0,
            # composite pack/unpack indices cost ~2 substeps' savings to
            # build (tune_r3e) — request them only when bins are reused
            composite_capacity=(config.p3m_cell_capacity
                                if config.p3m_rebin_interval > 1 else None))

    return bins_of


def p3m_substep_loop(state: Particles, bins, start, n, body, bins_of,
                     k: int):
    """Run ``n`` substeps with the frozen-bins Verlet amortization, starting
    at global substep index ``start`` (bins rebuild when the global index
    crosses a multiple of ``k``; index 0 reuses the caller's freshly built
    bins so no construction is wasted). Returns (state, bins) so a capture
    loop can carry the structure across frames."""

    def loop_body(j, carry):
        st, bins = carry
        i = start + j
        rebuild = (i % k == 0) & (i > 0) if k > 1 else i > 0
        bins = jax.lax.cond(
            rebuild, lambda op: bins_of(op[0]), lambda op: op[1],
            (st, bins))
        return body(st, p3m_bins=bins), bins

    return jax.lax.fori_loop(0, n, loop_body, (state, bins))


@functools.partial(
    jax.jit,
    static_argnames=("src_len", "src_real", "config", "backend", "interpret",
                     "extra_force"),
    donate_argnums=(0,),
)
def update_state(
    state: Particles,
    gm: jax.Array,
    valid: jax.Array,
    dt: jax.Array,
    n: jax.Array,
    *,
    src_len: int,
    src_real: int | None = None,
    config: SimConfig,
    backend: Backend,
    interpret: bool | None = None,
    extra_force=None,
) -> Particles:
    """Perform ``n`` substeps of size ``dt`` — the whole batch fused in one
    jitted call, no host round-trips (nbody.h:69-73 semantics). ``dt`` and
    ``n`` are traced, so speed/step changes never recompile.
    ``extra_force`` (see :func:`_step`) is jit-static: each distinct
    function object compiles once — define the hook once and reuse it."""
    body = functools.partial(
        _step, gm=gm, valid=valid, dt=dt,
        src_len=src_len, src_real=src_real, config=config, backend=backend,
        interpret=interpret, extra_force=extra_force,
    )
    if backend == "p3m":
        # Always route through the bins loop: the exact-core row selection
        # (top_k over the CONSTANT radius) hoists out of the substep loop,
        # and p3m_rebin_interval > 1 adds the Verlet-list amortization —
        # cell sorts recomputed every k substeps, every substep still
        # reading positions fresh through the frozen orders
        # (see ops/p3m_forces.p3m_bins).
        bins_of = p3m_bins_builder(state, gm, valid, src_len=src_len,
                                   config=config)
        st, _ = p3m_substep_loop(state, bins_of(state), 0, n, body, bins_of,
                                 config.p3m_rebin_interval)
        return st
    return jax.lax.fori_loop(0, n, lambda _, st: body(st), state)


@functools.partial(
    jax.jit,
    static_argnames=("src_len", "src_real", "config", "backend", "interpret",
                     "extra_force"),
    donate_argnums=(0, 1),
)
def update_state_merging(
    state: Particles,
    gm: jax.Array,
    valid: jax.Array,
    dt: jax.Array,
    n: jax.Array,
    *,
    src_len: int,
    src_real: int | None = None,
    config: SimConfig,
    backend: Backend,
    interpret: bool | None = None,
    extra_force=None,
) -> tuple[Particles, jax.Array]:
    """``update_state`` with ``SimConfig.merge_collisions``: each substep is
    followed by a simultaneous inelastic merge resolution
    (ops/collisions.merge_pass), and ``gm`` — the G-premultiplied source
    row every backend reads — becomes carried state. Returns (state, gm).

    jnp / pallas / pm read ``gm`` fresh each substep. p3m works at the
    default ``p3m_rebin_interval == 1``: without frozen bins the per-substep
    ``p3m_acc`` rebuilds its cell blocks (and the exact-core top_k, whose
    radii also change under merging) from the carried state — only
    ``p3m_rebin_interval > 1`` has a genuine staleness conflict and is
    rejected."""
    sub = merging_substep_fn(valid, src_len=src_len, src_real=src_real,
                             config=config, backend=backend,
                             interpret=interpret, extra_force=extra_force)
    return jax.lax.fori_loop(0, n, lambda _, c: sub(c, dt), (state, gm))


def merging_substep_fn(valid, *, src_len: int, src_real: int | None = None,
                       config: SimConfig, backend: Backend, interpret=None,
                       extra_force=None):
    """The substep-then-merge body shared by :func:`update_state_merging`,
    :func:`update_state_adaptive`, and trajectory capture
    (``trajectory.record_states``) — ONE definition so the update and
    --traj paths cannot drift. Returns ``((state, gm), dt) -> (state, gm)``
    (dt per call, so adaptive stepping can vary it)."""
    from .ops.collisions import merge_pass

    if backend == "p3m" and config.p3m_rebin_interval > 1:
        raise ValueError(
            "merge_collisions with backend='p3m' requires "
            "p3m_rebin_interval == 1 (frozen cell blocks cannot carry "
            f"mid-loop mass changes); got {config.p3m_rebin_interval} — "
            "use rebin interval 1, or the 'pm' backend")

    def sub(carry, dt):
        st, gm = carry
        st = _step(st, gm, valid, dt, src_len=src_len, src_real=src_real,
                   config=config, backend=backend, interpret=interpret,
                   extra_force=extra_force)
        # contact pass over the massive prefix only (every live row sits
        # below src_len; rows past it have gm == 0 and stay inert)
        pos, vel, radius, mass, gm_src = merge_pass(
            st.pos, st.vel, st.radius, st.mass, gm[:src_len],
            factor=config.merge_factor, g=config.g,
            chunk=min(512, src_len))
        return Particles(pos=pos, vel=vel, acc=st.acc, mass=mass,
                         radius=radius), gm.at[:src_len].set(gm_src)

    return sub


@functools.partial(
    jax.jit,
    static_argnames=("src_len", "src_real", "config", "backend", "interpret",
                     "extra_force"),
    donate_argnums=(0, 1),
)
def update_state_adaptive(
    state: Particles,
    gm: jax.Array,
    valid: jax.Array,
    t_span: jax.Array,
    *,
    eta: jax.Array,
    dt_min: jax.Array,
    dt_max: jax.Array,
    src_len: int,
    src_real: int | None = None,
    config: SimConfig,
    backend: Backend,
    interpret: bool | None = None,
    extra_force=None,
) -> tuple[Particles, jax.Array, jax.Array]:
    """Integrate for a fixed PHYSICAL time span with a per-substep global
    adaptive dt — the dynamic counterpart of the CLI's static ``--dt auto``.

    Each substep re-evaluates the softening-resolution criterion on the
    freshly stored accelerations (``eta · min_i sqrt(eps_i/|a_i|)``, the
    same rule as :func:`diagnostics.suggest_dt`), clamps to
    ``[dt_min, dt_max]``, and shrinks the final substep to land exactly on
    ``t_span``. A priming zero-dt substep populates ``acc`` first (nothing
    moves), so the first real dt is already acceleration-aware. All of
    eta/dt_min/dt_max/t_span are traced — retuning never recompiles.
    Returns (state, gm, n_substeps); `gm` only changes under
    ``merge_collisions`` (adaptive composes with merging — close
    encounters are exactly where both engage).

    ``lax.while_loop`` is forward-only: use :func:`autodiff.rollout` (fixed
    dt) when gradients are needed.
    """
    if config.merge_collisions:
        sub = merging_substep_fn(valid, src_len=src_len, src_real=src_real,
                                 config=config, backend=backend,
                                 interpret=interpret,
                                 extra_force=extra_force)
    else:
        def sub(carry, dt):
            st, gm = carry
            return _step(st, gm, valid, dt, src_len=src_len,
                         src_real=src_real, config=config, backend=backend,
                         interpret=interpret, extra_force=extra_force), gm

    # prime acc (dt = 0: v and x unchanged, acc stored)
    state, gm = sub((state, gm), jnp.float32(0.0))

    from .diagnostics import next_adaptive_dt

    def cond(carry):
        _, _, t, _ = carry
        return t < t_span

    def body(carry):
        st, gm, t, k = carry
        dt = next_adaptive_dt(st.acc, st.radius, eta=eta, dt_min=dt_min,
                              dt_max=dt_max, t=t, t_span=t_span)
        st, gm = sub((st, gm), dt)
        return st, gm, t + dt, k + 1

    state, gm, _, k = jax.lax.while_loop(
        cond, body, (state, gm, jnp.float32(0.0), jnp.int32(0)))
    return state, gm, k


class World:
    """Stateful wrapper mirroring the reference World ergonomics.

    Construction partitions massive-first, pads state to kernel-friendly
    shapes, and moves everything to device once. All updates stay on device.
    """

    def __init__(
        self,
        particles: Particles,
        *,
        config: SimConfig = DEFAULT_SIM_CONFIG,
        default_backend: Backend | None = None,
    ):
        # Device arrays stay on device (no np.asarray round trip — a real
        # creation-time cost at N=1M for device-generated scenes); host
        # arrays upload once here.
        from .types import DTYPE

        pos = jnp.asarray(particles.pos, DTYPE)
        vel = jnp.asarray(particles.vel, DTYPE)
        acc = jnp.asarray(particles.acc, DTYPE)
        mass = jnp.asarray(particles.mass, DTYPE)
        radius = jnp.asarray(particles.radius, DTYPE)
        n = pos.shape[0]
        # The ONLY device->host transfer at creation: one scalar (the count
        # of force-exerting particles, needed for static kernel shapes).
        mass_len = int(jax.device_get(jnp.count_nonzero(mass > 0.0)))

        # Source row length: massive particles rounded up to the 128-lane
        # alignment (exact-source kernel semantics; streaming-block multiple
        # above the VMEM residency budget); zero-gm padding keeps any extra
        # rows inert.
        src_len = source_pad_len(mass_len, config.tile_sources)
        # Padded total: >= src_len (sources are a prefix slice) and divisible
        # by the effective target tile (min(tile_targets, n_pad)); the fused
        # kernel halves its tile until it divides n_pad.
        n_pad = pad_to_tiles(max(n, src_len), 8, config.tile_targets)

        self.total_len = n
        self.mass_len = mass_len
        self.src_len = src_len
        self.n_pad = n_pad
        self.config = config

        self.state, self.gm, self.valid = _create_padded_state(
            pos, vel, acc, mass, radius, jnp.int32(mass_len),
            n_pad=n_pad, g=config.g,
        )

        if default_backend is None:
            default_backend = default_backend_for(n)
        self.default_backend: Backend = resolve_backend(
            default_backend, n, mass_len, merging=config.merge_collisions,
            rebin_interval=config.p3m_rebin_interval)
        self._host_cache: Particles | None = None

    # -- update ---------------------------------------------------------
    def update(self, dt: float, n: int = 1, backend: Backend | None = None,
               extra_force=None) -> "World":
        """n substeps. ``extra_force(pos, vel) -> acc`` optionally adds a
        user acceleration field (external potential, drag, thrust) on top
        of self-gravity — jit-static, so define the hook once and reuse the
        same function object across calls."""
        if n <= 0:
            return self
        backend = resolve_backend(
            backend or self.default_backend, self.total_len, self.mass_len,
            merging=self.config.merge_collisions,
            rebin_interval=self.config.p3m_rebin_interval)
        kwargs = dict(
            src_len=effective_src_len(backend, self.src_len, self.mass_len),
            src_real=self.mass_len, config=self.config, backend=backend,
            extra_force=extra_force,
        )
        args = (self.state, self.gm, self.valid,
                jnp.float32(dt), jnp.int32(n))
        if self.config.merge_collisions:
            # gm is carried state under merging (absorbed rows go inert)
            self.state, self.gm = update_state_merging(*args, **kwargs)
        else:
            self.state = update_state(*args, **kwargs)
        self._host_cache = None
        return self

    def update_adaptive(self, t_span: float, *, eta: float = 0.1,
                        dt_min: float = 1e-5, dt_max: float = 1.0,
                        backend: Backend | None = None,
                        extra_force=None) -> int:
        """Integrate for ``t_span`` physical time units with per-substep
        adaptive dt (see :func:`update_state_adaptive`). Returns the number
        of substeps taken. Composes with ``merge_collisions`` and
        ``extra_force``; forward-only (lax.while_loop)."""
        backend = resolve_backend(
            backend or self.default_backend, self.total_len, self.mass_len,
            merging=self.config.merge_collisions,
            rebin_interval=self.config.p3m_rebin_interval)
        self.state, self.gm, k = update_state_adaptive(
            self.state, self.gm, self.valid, jnp.float32(t_span),
            eta=jnp.float32(eta), dt_min=jnp.float32(dt_min),
            dt_max=jnp.float32(dt_max),
            src_len=effective_src_len(backend, self.src_len, self.mass_len),
            src_real=self.mass_len, config=self.config, backend=backend,
            extra_force=extra_force,
        )
        self._host_cache = None
        return int(jax.device_get(k))

    # Reference API names (nbody.h:69-73): "CPU" = vectorized jnp oracle,
    # "GPU" = the Pallas device kernel.
    def update_cpu(self, dt: float, n: int = 1) -> "World":
        return self.update(dt, n, backend="jnp")

    def update_gpu(self, dt: float, n: int = 1) -> "World":
        return self.update(dt, n, backend="pallas")

    # -- read back -------------------------------------------------------
    @property
    def particles(self) -> Particles:
        """Freshest state as host numpy, sliced to the real particle count —
        GetWorldParticles (world.c:91-97). Cached until the next update."""
        if self._host_cache is None:
            self._host_cache = self.state.slice_to(self.total_len).to_host()
        return self._host_cache

    def block_until_ready(self) -> "World":
        jax.block_until_ready(self.state)
        return self

    def __len__(self) -> int:
        return self.total_len


def create_world(
    particles: Particles,
    *,
    config: SimConfig = DEFAULT_SIM_CONFIG,
    default_backend: Backend | None = None,
) -> World:
    """CreateWorld (nbody.h:61)."""
    return World(particles, config=config, default_backend=default_backend)
