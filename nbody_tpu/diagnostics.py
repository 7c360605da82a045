"""Device-side physics diagnostics: momentum, energy, center of mass.

The reference exposes no diagnostics (its overlay shows FPS and sim mode
only); these are the quantities its de-facto correctness harness would have
needed (SURVEY.md §4). All computed on device in one jitted pass — O(N) for
momentum/CoM, O(N·M) (chunked) for potential energy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .types import G, Particles, SOFTENING_FLOOR


@jax.jit
def total_momentum(state: Particles) -> jax.Array:
    """Sum of m·v, shape (2,). Conserved up to the asymmetric softening."""
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


@jax.jit
def center_of_mass(state: Particles) -> jax.Array:
    m = jnp.sum(state.mass)
    return jnp.sum(state.mass[:, None] * state.pos, axis=0) / jnp.maximum(m, 1e-30)


@jax.jit
def kinetic_energy(state: Particles) -> jax.Array:
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=1))


@functools.partial(jax.jit, static_argnames=("mass_len", "chunk", "g"))
def potential_energy(
    state: Particles, mass_len: int, *, chunk: int = 1024, g: float = G
) -> jax.Array:
    """Softened potential with the reference's (asymmetric) softening:
    U = -G/2 * sum_i sum_{j<mass_len, j!=i} m_i m_j / sqrt(d_ij^2 + r_i).
    Every nonzero term has a massive target (m_i > 0), i.e. is a
    massive-massive pair counted from both ends — hence the uniform 1/2."""
    n = state.pos.shape[0]
    src_pos = state.pos[:mass_len]
    src_m = state.mass[:mass_len]

    pad = (-n) % chunk
    pos = jnp.pad(state.pos, ((0, pad), (0, 0)))
    # + SOFTENING_FLOOR: a coincident distinct pair with radius-0 target
    # would otherwise divide by exactly 0 (NaN guard, absorbed for real radii)
    rad = jnp.pad(state.radius, (0, pad), constant_values=1.0) + SOFTENING_FLOOR
    mass = jnp.pad(state.mass, (0, pad))
    idx = jnp.pad(jnp.arange(n), (0, pad), constant_values=-1)

    def tile_energy(tile):
        tpos, trad, tm, tidx = tile
        dx = src_pos[None, :, 0] - tpos[:, None, 0]
        dy = src_pos[None, :, 1] - tpos[:, None, 1]
        r = jnp.sqrt(dx * dx + dy * dy + trad[:, None])
        inv = jnp.where(
            tidx[:, None] == jnp.arange(mass_len)[None, :], 0.0, 1.0 / r
        )
        return -0.5 * g * jnp.sum(tm[:, None] * src_m[None, :] * inv)

    m = pos.shape[0] // chunk
    tiles = (
        pos.reshape(m, chunk, 2),
        rad.reshape(m, chunk),
        mass.reshape(m, chunk),
        idx.reshape(m, chunk),
    )
    return jnp.sum(jax.lax.map(tile_energy, tiles))


def total_energy(state: Particles, mass_len: int, **kw) -> jax.Array:
    return kinetic_energy(state) + potential_energy(state, mass_len, **kw)


def summary(world) -> dict:
    """Host-side diagnostic snapshot of a World."""
    st = world.state.slice_to(world.total_len)
    return {
        "n": world.total_len,
        "mass_len": world.mass_len,
        "momentum": tuple(float(x) for x in total_momentum(st)),
        "angular_momentum": float(angular_momentum(st)),
        "center_of_mass": tuple(float(x) for x in center_of_mass(st)),
        "kinetic_energy": float(kinetic_energy(st)),
        "potential_energy": float(potential_energy(st, world.mass_len)),
        "suggested_dt": float(suggest_dt(st)),
    }


@jax.jit
def angular_momentum(state: Particles) -> jax.Array:
    """Scalar z-angular momentum about the origin, L = sum m (x·vy - y·vx).
    Conserved by the pair force up to the reference's asymmetric per-target
    softening (same caveat as momentum) — a long-horizon drift diagnostic
    the reference never exposes."""
    x, y = state.pos[:, 0], state.pos[:, 1]
    vx, vy = state.vel[:, 0], state.vel[:, 1]
    return jnp.sum(state.mass * (x * vy - y * vx))


@functools.lru_cache(maxsize=None)
def observables_capture(mass_len: int, *, energy: str | None = "exact",
                        pe_chunk: int = 1024, pm_grid: int = 512,
                        pm_softening: float = 2.0):
    """Build a per-frame capture function for
    :func:`nbody_tpu.trajectory.record_states`: conserved-quantity time
    series streamed out of the jitted capture scan at O(scalars)/frame host
    traffic instead of O(N) position frames (the reference copies the whole
    particle array to the host every rendered frame, main.c:237-250, and
    exposes no observables at all).

    Returns ``(Particles, gm) -> dict`` with keys ``kinetic``,
    ``momentum`` (2,), ``angular_momentum``, ``center_of_mass`` (2,) and —
    when ``energy`` is not None — ``potential``. ``energy="exact"`` uses the
    O(N·M) pair sum (fine to ~100k); ``energy="pm"`` uses the mesh estimate
    (O(N + G²logG), the only affordable choice at pm/p3m scale). The capture
    runs *inside* the scan, so an exact-energy capture every k substeps adds
    one fused N·M pass per frame — no extra host round-trips, no extra
    launches. The factory is lru_cached on its arguments, so repeated
    ``record_observables`` calls with the same settings reuse ONE function
    object — and therefore ONE compiled executable (``capture`` is a static
    jit argument, like ``extra_force``; a fresh closure per call would
    retrace the whole scan, ~1.3 s vs ~0.14 s warm)."""
    if energy not in (None, "exact", "pm"):
        raise ValueError(f"energy must be None|'exact'|'pm', got {energy!r}")

    def capture(st: Particles, gm) -> dict:
        del gm  # mass changes (merging) are reflected in st.mass already
        out = {
            "kinetic": kinetic_energy(st),
            "momentum": total_momentum(st),
            "angular_momentum": angular_momentum(st),
            "center_of_mass": center_of_mass(st),
        }
        if energy == "exact":
            out["potential"] = potential_energy(st, mass_len, chunk=pe_chunk)
        elif energy == "pm":
            out["potential"] = potential_energy_pm(
                st, mass_len, grid=pm_grid, softening=pm_softening)
        return out

    return capture


def check_observables_args(capture, energy, capture_kw) -> None:
    """Validate the ``record_observables`` argument contract: a custom
    ``capture`` replaces the default observable set entirely, so a
    non-default ``energy`` or stray :func:`observables_capture` kwargs
    alongside it would be silently ignored — reject them instead."""
    if capture is not None and (capture_kw or energy != "exact"):
        raise ValueError(
            "a custom capture replaces the default observables entirely; "
            f"energy={energy!r} / extra kwargs {sorted(capture_kw)} would be "
            "silently ignored — drop them or drop capture")


def observables_series_out(series, frames: int, steps_per_frame: int,
                           dt: float) -> dict:
    """Captured device series -> the host dict contract shared by the
    single-chip and sharded ``record_observables``: numpy-ify, key, and
    append the synthesized ``"time"`` axis. A capture that already produced
    a ``"time"`` key is rejected rather than silently overwritten."""
    import numpy as np

    series = jax.tree.map(np.asarray, series)
    out = dict(series) if isinstance(series, dict) else {"capture": series}
    if "time" in out:
        raise ValueError(
            "capture returned a 'time' key, which collides with the "
            "synthesized time axis — rename it")
    out["time"] = (np.arange(1, frames + 1, dtype=np.float64)
                   * steps_per_frame * dt)
    return out


def criterion_dt(acc: jax.Array, radius: jax.Array, eta) -> jax.Array:
    """The softening-resolution criterion on raw arrays:
    eta · min_i sqrt(eps_i / |a_i|) with eps_i = sqrt(radius_i); +inf for a
    force-free world. THE single definition — :func:`suggest_dt`, the
    single-chip adaptive loop (world.update_state_adaptive) and both
    sharded adaptive loops (parallel.sharding) all call this, so the
    cross-path substep-count parity tests cannot drift."""
    a = jnp.sqrt(jnp.sum(acc**2, axis=1))
    t = jnp.where(a > 0, jnp.sqrt(jnp.sqrt(radius)
                                  / jnp.maximum(a, 1e-30)), jnp.inf)
    return eta * jnp.min(t)


def next_adaptive_dt(acc, radius, *, eta, dt_min, dt_max, t, t_span):
    """One adaptive-loop dt choice: the criterion clipped to
    [max(dt_min, 1e-9), dt_max] (floored away from 0 so the while_loop
    always terminates) and shrunk to land exactly on ``t_span``."""
    dt = jnp.clip(criterion_dt(acc, radius, eta),
                  jnp.maximum(dt_min, 1e-9), dt_max)
    return jnp.minimum(dt, t_span - t)


@functools.partial(jax.jit, static_argnames=("eta",))
def suggest_dt(state: Particles, *, eta: float = 0.1) -> jax.Array:
    """Global timestep suggestion: eta · min_i sqrt(eps_i / |a_i|) over rows
    with nonzero acceleration, where eps_i = sqrt(radius_i) is the softening
    length (the reference adds ``radius`` linearly to d², sim_cpu.c:176, so
    its square root is the length scale). The standard collisionless
    softening criterion — resolve the fastest orbit through the softened
    core. Uses the state's stored ``acc`` (valid after any substep); returns
    +inf for a force-free world."""
    return criterion_dt(state.acc, state.radius, eta)


@functools.partial(jax.jit, static_argnames=("mass_len", "grid", "g"))
def potential_energy_pm(
    state: Particles, mass_len: int, *,
    grid: int = 512, softening: float = 2.0, g: float = G
) -> jax.Array:
    """Mesh-estimated potential energy, O(N + G² log G) — the scalable
    companion to the exact O(N·M) :func:`potential_energy` for N where the
    pair sum is unaffordable (energy-drift monitoring at pm/p3m scale).

    Reuses the pm far-field machinery (ops/pm_forces.py): CIC-scatter the
    massive rows to a (G, G) mass grid, free-space-convolve with the even
    kernel 1/sqrt(r² + eps²) (correlation == convolution, no sign gymnastics),
    CIC-gather phi back at the massive rows, U = -1/2 sum m_i phi_i. The
    mesh includes each particle's interaction with its own CIC cloud; that
    self-term is removed *exactly* in the discrete sense — per particle it
    is gm·(w^T K w) over the 4 scatter/gather corner weights w and the 4x4
    corner-offset kernel table K (entries 1/eps, 1/sqrt(h²+eps²),
    1/sqrt(2h²+eps²)), a closed form costing O(N).

    Differences vs the exact sum: pairs closer than ~2-3 cells are smoothed
    to the global ``softening`` instead of the reference's per-target
    ``+ radius`` (the same caveat as the pm force path), and tracers
    (massless rows) contribute nothing here while the exact sum counts
    massive->tracer terms only via m_i = 0 too — so both count exactly the
    massive-massive pairs. Relative accuracy on clustered scenes is set by
    the far field and is typically well under 1% (test_diagnostics.py)."""
    from .ops.pm_forces import _box, _cic_scatter, _cic_weights

    pos = state.pos[:mass_len]
    m = state.mass[:mass_len]
    gm = g * m
    real = (gm != 0.0)

    s_min = jnp.min(jnp.where(real[:, None], pos, jnp.inf), axis=0)
    s_max = jnp.max(jnp.where(real[:, None], pos, -jnp.inf), axis=0)
    lo, h = _box(s_min, s_max, grid)
    inv_h = 1.0 / h
    eps2 = jnp.asarray(softening, jnp.float32) ** 2

    rho = _cic_scatter(pos, gm, lo, inv_h, grid)

    # free-space phi kernel (even): phi = -conv(rho, 1/sqrt(r^2+eps^2))
    n2 = 2 * grid
    idx = jnp.arange(n2)
    d = jnp.where(idx < grid, idx, idx - n2).astype(rho.dtype)
    dist2 = (d[:, None] * h) ** 2 + (d[None, :] * h) ** 2
    k_phi = jax.lax.rsqrt(dist2 + eps2)
    rho_pad = jnp.zeros((n2, n2), rho.dtype).at[:grid, :grid].set(rho)
    phi = -jnp.fft.irfft2(
        jnp.fft.rfft2(rho_pad) * jnp.fft.rfft2(k_phi), s=(n2, n2)
    )[:grid, :grid]

    # CIC gather of phi at the massive rows
    i0, j0, wx, wy = _cic_weights(pos, lo, inv_h, grid)
    w4 = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                    (1 - wx) * wy, wx * wy], axis=-1)          # (M, 4)
    phi_i = (w4[:, 0] * phi[i0, j0] + w4[:, 1] * phi[i0 + 1, j0]
             + w4[:, 2] * phi[i0, j0 + 1] + w4[:, 3] * phi[i0 + 1, j0 + 1])

    # exact discrete self-term: corner offsets are 0, h, or h*sqrt(2)
    k0 = jax.lax.rsqrt(eps2)
    k1 = jax.lax.rsqrt(h * h + eps2)
    k2 = jax.lax.rsqrt(2 * h * h + eps2)
    kmat = jnp.array([[0.0, 1.0, 1.0, 2.0],
                      [1.0, 0.0, 2.0, 1.0],
                      [1.0, 2.0, 0.0, 1.0],
                      [2.0, 1.0, 1.0, 0.0]], jnp.float32)
    ktab = k0 * (kmat == 0) + k1 * (kmat == 1) + k2 * (kmat == 2)
    self_phi = -gm * jnp.einsum("na,ab,nb->n", w4, ktab, w4)

    return 0.5 * jnp.sum(m * (phi_i - self_phi))
