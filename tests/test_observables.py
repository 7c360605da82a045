"""Observable streaming: per-frame conserved-quantity series captured inside
the jitted scan equal the same quantities computed by stepping + host-side
diagnostics. The reference has no observables at all (its overlay shows FPS
and sim mode only, main.c:194-217); this is the O(scalars)-per-frame path for
long-horizon drift monitoring where capturing positions would be O(N)/frame.
"""

import numpy as np
import pytest
from helpers import TINY

from nbody_tpu import create_world, make_galaxies
from nbody_tpu.diagnostics import (
    angular_momentum,
    center_of_mass,
    kinetic_energy,
    observables_capture,
    potential_energy,
    potential_energy_pm,
    total_momentum,
)
from nbody_tpu.trajectory import record_observables
from nbody_tpu.types import SimConfig

FRAMES, SPF, DT = 4, 3, 0.005


def _manual_series(w, backend, frames=FRAMES):
    rows = []
    for _ in range(frames):
        w.update(DT, SPF, backend=backend)
        st = w.state
        rows.append({
            "kinetic": float(kinetic_energy(st)),
            "potential": float(potential_energy(st, w.mass_len)),
            "momentum": np.asarray(total_momentum(st)),
            "angular_momentum": float(angular_momentum(st)),
            "center_of_mass": np.asarray(center_of_mass(st)),
        })
    return rows


def test_observables_match_stepping():
    scene = make_galaxies(300, 2, seed=11)
    w1 = create_world(scene, config=TINY)
    w2 = create_world(scene, config=TINY)

    obs = record_observables(w1, DT, frames=FRAMES, steps_per_frame=SPF,
                             backend="jnp")
    manual = _manual_series(w2, "jnp")

    assert obs["kinetic"].shape == (FRAMES,)
    assert obs["momentum"].shape == (FRAMES, 2)
    np.testing.assert_allclose(obs["time"], DT * SPF * np.arange(1, FRAMES + 1),
                               rtol=1e-12)
    for k in range(FRAMES):
        np.testing.assert_allclose(obs["kinetic"][k], manual[k]["kinetic"],
                                   rtol=1e-5)
        np.testing.assert_allclose(obs["potential"][k], manual[k]["potential"],
                                   rtol=1e-5)
        np.testing.assert_allclose(obs["momentum"][k], manual[k]["momentum"],
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(obs["angular_momentum"][k],
                                   manual[k]["angular_momentum"], rtol=1e-5)
        np.testing.assert_allclose(obs["center_of_mass"][k],
                                   manual[k]["center_of_mass"], rtol=1e-4)
    # the world advanced: same final state as the manual twin
    np.testing.assert_array_equal(np.asarray(w1.particles.pos),
                                  np.asarray(w2.particles.pos))


def test_energy_selector():
    scene = make_galaxies(256, 1, seed=3)

    w = create_world(scene, config=TINY)
    none = record_observables(w, DT, frames=2, backend="jnp", energy=None)
    assert "potential" not in none and "kinetic" in none

    w = create_world(scene, config=TINY)
    pm = record_observables(w, DT, frames=2, backend="jnp", energy="pm",
                            pm_grid=256)
    exact = potential_energy(w.state, w.mass_len)
    mesh = potential_energy_pm(w.state, w.mass_len, grid=256)
    # the in-scan pm estimate at the final frame equals the post-hoc one
    np.testing.assert_allclose(pm["potential"][-1], float(mesh), rtol=1e-5)
    # and the mesh estimate tracks the exact sum (tight accuracy bounds for
    # potential_energy_pm itself live in test_diagnostics; this tiny
    # 256-body scene is close-pair dominated, so just sanity-bound it)
    assert abs(float(mesh) - float(exact)) < 0.2 * abs(float(exact))

    with pytest.raises(ValueError):
        observables_capture(10, energy="bogus")


def test_observables_p3m_and_merging():
    scene = make_galaxies(300, 2, seed=7)

    # p3m branch: the frozen-bins capture loop gates rebuilds on the GLOBAL
    # substep index, so it matches one fused update of the same span (a
    # per-update manual loop would restart the rebin counter each call)
    cfg = SimConfig(tile_targets=8, tile_sources=128, p3m_rebin_interval=2)
    w1 = create_world(scene, config=cfg)
    w2 = create_world(scene, config=cfg)
    obs = record_observables(w1, DT, frames=FRAMES, steps_per_frame=SPF,
                             backend="p3m")
    w2.update(DT, FRAMES * SPF, backend="p3m")
    np.testing.assert_allclose(np.asarray(w1.particles.pos),
                               np.asarray(w2.particles.pos), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(obs["kinetic"][-1],
                               float(kinetic_energy(w2.state)), rtol=1e-5)
    np.testing.assert_allclose(obs["potential"][-1],
                               float(potential_energy(w2.state, w2.mass_len)),
                               rtol=1e-5)

    # merging branch: st.mass reflects absorptions, so KE/CoM stay honest
    mcfg = SimConfig(tile_targets=8, tile_sources=128, merge_collisions=True)
    w1 = create_world(scene, config=mcfg)
    w2 = create_world(scene, config=mcfg)
    obs = record_observables(w1, DT, frames=FRAMES, steps_per_frame=SPF,
                             backend="jnp")
    manual = _manual_series(w2, "jnp")
    for k in range(FRAMES):
        np.testing.assert_allclose(obs["kinetic"][k], manual[k]["kinetic"],
                                   rtol=1e-5)
        np.testing.assert_allclose(obs["momentum"][k], manual[k]["momentum"],
                                   rtol=1e-5, atol=1e-3)


def test_sharded_observables_match_single_chip():
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = make_galaxies(300, 2, seed=11)
    mesh = make_mesh(4)
    sw = ShardedWorld(scene, mesh=mesh, config=TINY, force_backend="jnp")
    w = create_world(scene, config=TINY)

    sobs = sw.record_observables(DT, frames=FRAMES, steps_per_frame=SPF)
    obs = record_observables(w, DT, frames=FRAMES, steps_per_frame=SPF,
                             backend="jnp")
    for key in ("kinetic", "potential", "momentum", "angular_momentum",
                "center_of_mass", "time"):
        np.testing.assert_allclose(sobs[key], obs[key], rtol=2e-4, atol=1e-2)


def test_sharded_observables_pm_and_record_still_works():
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = make_galaxies(400, 1, seed=13)
    mesh = make_mesh(2)
    sw = ShardedWorld(scene, mesh=mesh, config=TINY, force_backend="pm")
    obs = sw.record_observables(DT, frames=2, energy="pm", pm_grid=128)
    assert obs["potential"].shape == (2,) and np.isfinite(obs["potential"]).all()
    # position capture through the same runner (capture=None) still works
    traj = sw.record(DT, frames=2)
    assert traj.shape == (2, 400, 2)


def test_custom_capture():
    scene = make_galaxies(200, 1, seed=9)
    w = create_world(scene, config=TINY)
    out = record_observables(
        w, DT, frames=3, backend="jnp",
        capture=lambda st, gm: jnp_max_speed(st))
    assert out["capture"].shape == (3,)
    assert np.all(out["capture"] > 0)


def jnp_max_speed(st):
    import jax.numpy as jnp
    return jnp.max(jnp.sum(st.vel**2, axis=1)) ** 0.5
