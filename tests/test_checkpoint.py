"""Checkpoint/resume round-trip (capability the reference lacks; SURVEY.md §5)."""

import numpy as np
from helpers import TINY

from nbody_tpu import create_world, make_galaxies
from nbody_tpu.types import SimConfig
from nbody_tpu.utils import load_world, save_particles, load_particles, save_world


def test_particles_roundtrip(tmp_path):
    scene = make_galaxies(300, 2, seed=1)
    path = str(tmp_path / "state.npz")
    save_particles(path, scene, step=np.int64(7))
    loaded, extra = load_particles(path)
    np.testing.assert_array_equal(np.asarray(loaded.pos), np.asarray(scene.pos))
    np.testing.assert_array_equal(np.asarray(loaded.mass), np.asarray(scene.mass))
    assert int(extra["step"]) == 7


def test_world_resume_continues_identically(tmp_path):
    scene = make_galaxies(250, 1, seed=2)
    w = create_world(scene, config=TINY)
    w.update(0.01, 3, backend="jnp")
    path = str(tmp_path / "ckpt.npz")
    save_world(path, w, step=3)

    resumed, step = load_world(path, config=TINY)
    assert step == 3
    assert resumed.mass_len == w.mass_len

    w.update(0.01, 4, backend="jnp")
    resumed.update(0.01, 4, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(resumed.particles.pos), np.asarray(w.particles.pos), rtol=1e-6
    )
