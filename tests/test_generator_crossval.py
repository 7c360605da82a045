"""Production generators cross-validated against the bit-exact oracle
(round-4 VERDICT task 6).

`galaxy.py` (vectorized numpy) and `models/galaxy_device.py` (jitted
jax.random) were previously tested only via structural invariants; with
`make_galaxies_libc` reproducing the reference's own `MakeGalaxies`
bit-for-bit (tests/test_libc_scene.py), reference-derived ground truth is
available for DISTRIBUTION-level checks: a transcription error in any
`galaxy.h:10-61` constant (core density 30 / particle density 10, NP radius
band [1.5, 9.5], core radius band [200, 600], the distance-proportional
massless rule, arm spread) shifts one of these statistics and fails against
the oracle.

Statistics aggregate over several seeds; tolerances are set from the
sampling noise of the aggregate (documented per assertion), so the tests
are deterministic and far tighter than the allowed constant errors.
"""

import numpy as np
import pytest

import jax

from helpers import particles_as_rows
from nbody_tpu import make_galaxies
from nbody_tpu.models import make_galaxies_device, make_galaxies_libc
from nbody_tpu.models.galaxy_ref import available as libm_available
from nbody_tpu.types import G

pytestmark = pytest.mark.skipif(
    not libm_available(), reason="oracle needs the platform libm via ctypes")

N, GALS = 2000, 2
SEEDS = range(1, 9)  # 8 scenes per generator -> 16k particles aggregated

CORE_RADIUS_MIN = 200.0  # galaxy.h: core radius band lower edge


def rows_for(gen, seed):
    if gen == "oracle":
        return particles_as_rows(make_galaxies_libc(N, GALS, seed=seed))
    if gen == "numpy":
        return particles_as_rows(make_galaxies(N, GALS, seed=seed))
    return particles_as_rows(
        make_galaxies_device(jax.random.PRNGKey(seed), N, GALS))


def scene_stats(rows):
    """Per-scene statistics in reference-derived terms."""
    mass, radius = rows[:, 4], rows[:, 5]
    is_core = radius >= CORE_RADIUS_MIN
    is_tracer = mass == 0.0
    is_body = ~is_core & ~is_tracer
    cores = rows[is_core]
    # distance of each non-core particle to its (nearest) core, normalized
    # by that core's radius — the shape of the disk
    d = np.linalg.norm(rows[~is_core, None, :2] - cores[None, :, :2], axis=2)
    nearest = d.argmin(1)
    dist_norm = d[np.arange(len(d)), nearest] / cores[nearest, 5]
    return dict(
        tracer_frac=is_tracer.mean(),
        body_radius_mean=radius[is_body].mean(),
        body_radius_minmax=(radius[is_body].min(), radius[is_body].max()),
        core_radii=cores[:, 5],
        core_mass_ratio=cores[:, 4] / cores[:, 5] ** 3,
        body_mass_ratio=mass[is_body] / radius[is_body] ** 3,
        dist_norm=dist_norm,
        tracer_mask=is_tracer[~is_core],
    )


@pytest.fixture(scope="module")
def agg():
    out = {}
    for gen in ("oracle", "numpy", "device"):
        stats = [scene_stats(rows_for(gen, s)) for s in SEEDS]
        out[gen] = stats
    return out


def _pooled(agg, gen, key):
    return np.concatenate([np.atleast_1d(s[key]) for s in agg[gen]])


@pytest.mark.parametrize("gen", ["numpy", "device"])
def test_mass_density_constants_match_oracle(agg, gen):
    """m = (4*pi*rho/3) r^3 with rho=30 (cores) / rho=10 (bodies)
    (galaxy.h:21-24) — the ratio m/r^3 is a CONSTANT, so any density or
    formula transcription error fails exactly, no statistics needed."""
    for key in ("core_mass_ratio", "body_mass_ratio"):
        want = _pooled(agg, "oracle", key)
        got = _pooled(agg, gen, key)
        np.testing.assert_allclose(got.mean(), want.mean(), rtol=1e-4)
        assert got.std() / got.mean() < 1e-4  # constant within fp32 noise


@pytest.mark.parametrize("gen", ["numpy", "device"])
def test_body_radius_band_matches_oracle(agg, gen):
    """NP radius ~ U[1.5, 9.5] (galaxy.h): mean ~5.5 with se ~0.03 at this
    aggregate size; 0.25 tolerance catches any shifted band while being
    ~8 sigma from false alarm."""
    want = np.mean([s["body_radius_mean"] for s in agg["oracle"]])
    got = np.mean([s["body_radius_mean"] for s in agg[gen]])
    assert abs(got - want) < 0.25, (got, want)
    lo, hi = zip(*(s["body_radius_minmax"] for s in agg[gen]))
    olo, ohi = zip(*(s["body_radius_minmax"] for s in agg["oracle"]))
    assert min(lo) >= min(olo) - 0.1 and max(hi) <= max(ohi) + 0.1


@pytest.mark.parametrize("gen", ["numpy", "device"])
def test_core_radius_band_matches_oracle(agg, gen):
    """Core radius ~ U[200, 600): 16 cores/generator gives se ~ 29 on the
    mean; 120 tolerance (~3 sigma of the difference) catches any rescaled
    band (the reference's own constants changed by 2x would shift ~200)."""
    want = _pooled(agg, "oracle", "core_radii")
    got = _pooled(agg, gen, "core_radii")
    assert got.min() >= 195 and got.max() <= 605
    assert abs(got.mean() - want.mean()) < 120, (got.mean(), want.mean())


@pytest.mark.parametrize("gen", ["numpy", "device"])
def test_tracer_fraction_matches_oracle(agg, gen):
    """The distance-proportional massless rule (galaxy.c:204-210) fixes the
    expected tracer fraction; per-scene it is tight (binomial-ish). Aggregate
    means must agree within 0.06 absolute (measured generator-to-generator
    spread < 0.02; a swapped or inverted rule moves it > 0.2)."""
    want = np.mean([s["tracer_frac"] for s in agg["oracle"]])
    got = np.mean([s["tracer_frac"] for s in agg[gen]])
    assert abs(got - want) < 0.06, (got, want)


@pytest.mark.parametrize("gen", ["numpy", "device"])
def test_disk_shape_matches_oracle(agg, gen):
    """Radial distribution of non-core particles about their core (in core
    radii): quantiles within 20% relative of the oracle's — catches arm
    length/spread constant errors (galaxy.h spiral section) that leave all
    per-scene invariants intact. Measured: body quantiles within 4%, the
    q90 tail within 15% (the tail is the jitter-draw-order-sensitive part);
    a halved/doubled arm constant moves every quantile ~2x."""
    qs = [0.25, 0.5, 0.75, 0.9]
    want = np.quantile(_pooled(agg, "oracle", "dist_norm"), qs)
    got = np.quantile(_pooled(agg, gen, "dist_norm"), qs)
    rel = np.abs(got - want) / want
    assert np.all(rel < 0.20), dict(zip(qs, rel))


@pytest.mark.parametrize("gen", ["numpy", "device"])
def test_tracer_probability_rises_with_distance(agg, gen):
    """The massless rule is distance-proportional: in the outer half of the
    disk the tracer fraction must exceed the inner half's — in the oracle
    AND in both production generators (a flipped sign/ratio fails here)."""
    for g_ in ("oracle", gen):
        dist = _pooled(agg, g_, "dist_norm")
        tracer = _pooled(agg, g_, "tracer_mask")
        med = np.median(dist)
        inner, outer = tracer[dist <= med].mean(), tracer[dist > med].mean()
        assert outer > inner + 0.1, (g_, inner, outer)
