"""Core particle state types and constants.

TPU-native counterpart of the reference's ``include/nbody.h`` (reference:
``include/nbody.h:8`` for NB_G, ``include/nbody.h:47-50`` for ``Particle``).

Instead of an array-of-structs ``Particle {pos, vel, acc: V2; mass, radius}``,
state is a structure-of-arrays pytree (``Particles``) that lives in device HBM
and flows through jitted step functions. fp32 everywhere, matching the
reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Gravitational constant; `g = G * mass / dist^2` (reference include/nbody.h:8).
G = 10.0

# Default fp32 dtype used for all physical state (reference is fp32 throughout).
DTYPE = jnp.float32

# Additive floor folded into the *target radius* wherever a backend forms the
# softened r2 = dist_sq + radius. In fp32 the add is absorbed bitwise for any
# radius > ~2e-11 (reference radii are >= 0.5, galaxy.c:205-209), so physics is
# unchanged for real inputs; its only effect is turning the degenerate
# 0/0 -> NaN of a zero-gm source coincident with a radius-0 target (e.g. the
# source-alignment rows world.source_pad_len appends, or a hand-built
# all-tracer world) into an exact 0. 1e-18 is far above the value whose ^1.5
# would underflow fp32 (~1.25e-30), so gm / (sqrt(r2) * r2) stays well-defined.
SOFTENING_FLOOR = 1e-18


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pos", "vel", "acc", "mass", "radius"],
    meta_fields=[],
)
@dataclass
class Particles:
    """SoA particle state pytree.

    Shapes: ``pos``, ``vel``, ``acc`` are ``(N, 2)``; ``mass``, ``radius`` are
    ``(N,)``. All fp32. N may include trailing padding rows (see
    :func:`nbody_tpu.world.create_world`); padding rows have ``mass == 0`` and
    ``radius == 1`` and are kept identically zero in pos/vel/acc by the
    integrator's validity mask.
    """

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    mass: jax.Array
    radius: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    def __len__(self) -> int:
        return self.n

    def to_host(self) -> "Particles":
        """Explicit device->host export (the only place data leaves the device,
        collapsing the reference's lazy staging-buffer sync, world.c:76-89)."""
        return Particles(*(np.asarray(x) for x in astuple_shallow(self)))

    def slice_to(self, n: int) -> "Particles":
        return Particles(
            pos=self.pos[:n],
            vel=self.vel[:n],
            acc=self.acc[:n],
            mass=self.mass[:n],
            radius=self.radius[:n],
        )


def astuple_shallow(p: Particles) -> tuple:
    return (p.pos, p.vel, p.acc, p.mass, p.radius)


def make_particles(
    pos: Any, vel: Any = None, mass: Any = None, radius: Any = None, acc: Any = None
) -> Particles:
    """Build a Particles pytree from array-likes, filling defaults."""
    pos = jnp.asarray(pos, DTYPE)
    n = pos.shape[0]
    if pos.shape != (n, 2):
        raise ValueError(f"pos must have shape (N, 2), got {pos.shape}")

    def _arr(x, shape, default):
        if x is None:
            return jnp.full(shape, default, DTYPE)
        x = jnp.asarray(x, DTYPE)
        if x.shape != shape:
            raise ValueError(f"expected shape {shape}, got {x.shape}")
        return x

    return Particles(
        pos=pos,
        vel=_arr(vel, (n, 2), 0.0),
        acc=_arr(acc, (n, 2), 0.0),
        mass=_arr(mass, (n,), 0.0),
        radius=_arr(radius, (n,), 1.0),
    )


def zeros_particles(n: int) -> Particles:
    return Particles(
        pos=jnp.zeros((n, 2), DTYPE),
        vel=jnp.zeros((n, 2), DTYPE),
        acc=jnp.zeros((n, 2), DTYPE),
        mass=jnp.zeros((n,), DTYPE),
        radius=jnp.ones((n,), DTYPE),
    )


def concat_particles(a: Particles, b: Particles) -> Particles:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


@dataclass(frozen=True)
class SimConfig:
    """Simulation configuration.

    The reference bakes these as compile-time constants / Vulkan specialization
    constants (``sim_gpu.c:54-72``); here they are static Python values closed
    over by jitted step functions, giving the same recompile-on-change
    semantics.
    """

    g: float = G
    # tile_targets: target-chunk for the jnp backend (lax.map tile) and the
    # ring kernel; also the padding granule for world state. tile_sources:
    # source-chunk for all kernels. kernel_tile_targets: target tile of the
    # fused single-chip Pallas kernel (it halves itself until it divides the
    # padded N). Defaults tuned on TPU v5e at N=65k (scripts/ablations/tune_r2*.py):
    # the fused kernel runs (1024 x 2048) blocks with 128-wide slice FMAs
    # within the 16MB VMEM limit.
    tile_targets: int = 512
    tile_sources: int = 2048
    kernel_tile_targets: int = 1024
    # precise=True uses exact sqrt+divide (matching the reference shader,
    # particle_cs.glsl:42-48); False uses rsqrt^3, which on TPU is accurate to
    # ~1.4e-7 rel (measured vs fp64 — fp32 noise level) and ~45% faster.
    precise: bool = False
    # Integrator: "euler" = the reference's semi-implicit Euler (v += a*dt;
    # x += v*dt — sim_cpu.c:192-193), first order; "leapfrog" = position-
    # Verlet / DKD (drift-kick-drift), second order and symplectic, one force
    # evaluation per substep, no carried state; "yoshida4" = 4th-order
    # symplectic composition of three weighted DKD stages (3 force
    # evaluations per substep — see nbody_tpu/integrators.py). Beyond-
    # reference options; default preserves exact reference semantics.
    integrator: str = "euler"
    # Particle-mesh far-field backend ("pm"): grid resolution (static; one
    # compile per value) and the global Plummer softening length (traced).
    # Approximate solver for very large N — see ops/pm_forces.py.
    pm_grid: int = 512
    pm_softening: float = 2.0
    # P³M backend ("p3m"): PM far field (tapered at rc = p3m_rc_cells grid
    # cells) + exact short-range pair correction from cells holding up to
    # p3m_cell_capacity heaviest sources + direct-sum override for the
    # p3m_exact_targets largest-radius targets (galaxy cores). Accurate at
    # all ranges, still O(N) — see ops/p3m_forces.py.
    p3m_rc_cells: int = 4
    p3m_cell_capacity: int = 96
    p3m_exact_targets: int = 64
    # Verlet-list amortization for p3m: recompute the cell sorts every this
    # many substeps instead of every substep (1 = exact, the default).
    # Positions are always read fresh through the frozen orders; the error
    # is pairs that crossed the (taper-suppressed) rc boundary since the
    # last rebin — bounded by the drift per k substeps. Works on sharded
    # worlds too (the frozen collective bins ride the in-shard_map loop).
    p3m_rebin_interval: int = 1
    # PP pair-map chunking: iterate the cell map pp_chunk cells per scan
    # step and skip chunks with no targets or no candidate sources — the
    # skipped cells' correction is exactly zero (the chunked map is
    # bit-identical; recompiled fusion elsewhere may differ by ~1 ulp).
    # Galaxy scenes are clusters (most chunks empty): measured 1.09x on
    # the PP stage at N=1M (scripts/ablations/tune_r3g_pp_skip.py). 0 disables;
    # silently ignored when the value does not divide gc².
    p3m_pp_chunk: int = 64
    # Opt-in PP active-cell compaction: run the chunked pair map over a
    # static panel of this many compacted active cells instead of all gc²
    # (lax.cond falls back to the full map when actives overflow the
    # panel, so results are exact at any setting — only speed depends on
    # occupancy). Measured 80.5 -> 70.4 ms on the isolated PP stage at
    # N=1M/4gal with gc²/4 = 4096 (scripts/ablations/tune_r3i_pp_compact.py). Must
    # be a multiple of p3m_pp_chunk; 0 disables (the default — both cond
    # arms stay compiled, so it costs compile time when on).
    p3m_pp_compact: int = 0
    # Perfectly inelastic collision merging (opt-in, no reference
    # counterpart): after each substep, overlapping massive bodies
    # (|d| < merge_factor * (r_i + r_j)) merge lighter-into-heavier with
    # exact mass/momentum transfer; the absorbed row becomes a massless
    # tracer (static shapes — nothing is ever removed). O(M²) contact
    # pass per substep on the massive prefix — see ops/collisions.py.
    # Supported on the jnp / pallas / pm backends (p3m's frozen gm cell
    # blocks would go stale; rejected at update time).
    merge_collisions: bool = False
    merge_factor: float = 1.0

    def __post_init__(self):
        if self.merge_factor <= 0:
            raise ValueError(
                f"merge_factor must be > 0, got {self.merge_factor}")
        if self.integrator not in ("euler", "leapfrog", "yoshida4"):
            raise ValueError(
                "integrator must be 'euler', 'leapfrog', or 'yoshida4', "
                f"got {self.integrator!r}"
            )
        if self.pm_grid < 64:
            raise ValueError(f"pm_grid must be >= 64, got {self.pm_grid}")
        if self.pm_softening <= 0:
            raise ValueError(
                f"pm_softening must be > 0, got {self.pm_softening}")
        if self.p3m_rc_cells < 2:
            raise ValueError(
                f"p3m_rc_cells must be >= 2, got {self.p3m_rc_cells}")
        if self.p3m_cell_capacity < 8:
            raise ValueError(
                f"p3m_cell_capacity must be >= 8, got {self.p3m_cell_capacity}")
        if self.p3m_exact_targets < 0:
            raise ValueError(
                f"p3m_exact_targets must be >= 0, got {self.p3m_exact_targets}")
        if self.p3m_rebin_interval < 1:
            raise ValueError(
                f"p3m_rebin_interval must be >= 1, got "
                f"{self.p3m_rebin_interval}")
        if self.p3m_pp_chunk < 0:
            raise ValueError(
                f"p3m_pp_chunk must be >= 0 (0 = off), got "
                f"{self.p3m_pp_chunk}")
        if self.p3m_pp_compact < 0:
            raise ValueError(
                f"p3m_pp_compact must be >= 0 (0 = off), got "
                f"{self.p3m_pp_compact}")
        if self.p3m_pp_compact:
            if not self.p3m_pp_chunk:
                raise ValueError(
                    "p3m_pp_compact requires p3m_pp_chunk > 0 (the "
                    "compacted panel is iterated in pp_chunk-cell pieces)")
            if self.p3m_pp_compact % self.p3m_pp_chunk:
                raise ValueError(
                    f"p3m_pp_compact ({self.p3m_pp_compact}) must be a "
                    f"multiple of p3m_pp_chunk ({self.p3m_pp_chunk})")
        if (self.tile_targets < 8 or self.tile_sources < 128
                or self.kernel_tile_targets < 8
                or self.tile_targets % 8 or self.tile_sources % 128
                or self.kernel_tile_targets % 8):
            raise ValueError(
                f"tile_targets/kernel_tile_targets must be multiples of 8 and "
                f"tile_sources a multiple of 128, got "
                f"{self.tile_targets}/{self.kernel_tile_targets}x{self.tile_sources}"
            )


# Galaxy generation constants, mirroring include/galaxy.h:10-61.
@dataclass(frozen=True)
class GalaxyConfig:
    pi: float = 3.1415927
    min_spirals: int = 2
    max_spirals: int = 4
    gc_min_r: float = 200.0
    gc_max_r: float = 600.0
    gc_density: float = 30.0
    np_min_r: float = 1.5
    np_max_r: float = 9.5
    np_density: float = 10.0
    min_particles_per_galaxy: int = 100
    min_particle_dist_cr_f: float = 5.0
    max_particle_dist_cr_f: float = 10.0
    max_particle_dist_pc_f: float = 300.0
    min_galaxy_separation: float = 1.4
    max_galaxy_separation: float = 2.0
    # Massless tracer parameters (galaxy.c:205-206).
    tracer_radius: float = 0.5

    def r_to_m(self, r, density) -> Any:
        """Mass from radius: m = (4*pi*rho/3) * r^3 (galaxy.h:21-24)."""
        return (4.0 * self.pi * density / 3.0) * r * r * r

    @property
    def min_gc_mass(self) -> float:
        return float(self.r_to_m(self.gc_min_r, self.gc_density))


DEFAULT_GALAXY_CONFIG = GalaxyConfig()
DEFAULT_SIM_CONFIG = SimConfig()


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to_tiles(n: int, align: int, tile: int) -> int:
    """Pad a length to the Pallas kernel's divisibility rule: a multiple of
    ``align`` when it fits in one tile, else a multiple of ``tile`` (the
    kernel uses an effective tile of min(tile, n))."""
    n = round_up(max(n, 1), align)
    if n > tile:
        n = round_up(n, tile)
    return n
