"""Checkpoint/resume round-trip (capability the reference lacks; SURVEY.md §5)."""

import numpy as np
import pytest
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


def test_orbax_roundtrip(tmp_path):
    pytest = __import__("pytest")
    pytest.importorskip("orbax.checkpoint")
    from nbody_tpu.utils.checkpoint import load_world_orbax, save_world_orbax

    scene = make_galaxies(250, 1, seed=6)
    w = create_world(scene, config=TINY)
    w.update(0.01, 2, backend="jnp")
    path = str(tmp_path / "orbax_ckpt")
    save_world_orbax(path, w, step=2)

    resumed, step = load_world_orbax(path, config=TINY)
    assert step == 2
    np.testing.assert_allclose(
        np.asarray(resumed.particles.pos), np.asarray(w.particles.pos), rtol=1e-6
    )
    w.update(0.01, 3, backend="jnp")
    resumed.update(0.01, 3, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(resumed.particles.pos), np.asarray(w.particles.pos), rtol=1e-6
    )


def test_orbax_sharded_native_restore(tmp_path):
    """Sharded restore reads each shard to its device from disk — no
    device->host gather of the arrays anywhere in the restore path."""
    import jax
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
    from nbody_tpu.utils.checkpoint import (
        load_sharded_world_orbax, save_world_orbax)

    pytest.importorskip("orbax.checkpoint")
    scene = make_galaxies(250, 1, seed=6)
    mesh = make_mesh(4)
    sw = ShardedWorld(scene, mesh, config=TINY, force_backend="jnp")
    sw.update(0.01, 3)
    sw.block_until_ready()
    path = str(tmp_path / "ck_sharded")
    save_world_orbax(path, sw, step=3)

    with jax.transfer_guard_device_to_host("disallow"):
        sw2, step = load_sharded_world_orbax(
            path, mesh, config=TINY, force_backend="jnp")
        jax.block_until_ready(sw2.pos)
    assert step == 3
    assert sw2.total_len == sw.total_len and sw2.mass_len == sw.mass_len
    # restored arrays keep the mesh sharding
    assert sw2.pos.sharding == sw.pos.sharding
    np.testing.assert_array_equal(np.asarray(sw2.pos), np.asarray(sw.pos))
    # and the restored world resumes identically to the original
    sw.update(0.01, 2)
    sw2.update(0.01, 2)
    np.testing.assert_allclose(np.asarray(sw2.particles.pos),
                               np.asarray(sw.particles.pos), atol=1e-6)


def test_orbax_sharded_restore_layout_mismatch(tmp_path):
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
    from nbody_tpu.utils.checkpoint import (
        load_sharded_world_orbax, save_world_orbax)

    pytest.importorskip("orbax.checkpoint")
    scene = make_galaxies(250, 1, seed=6)
    sw = ShardedWorld(scene, make_mesh(4), config=TINY, force_backend="jnp")
    path = str(tmp_path / "ck_mismatch")
    save_world_orbax(path, sw, step=0)
    with pytest.raises(ValueError, match="padded size"):
        load_sharded_world_orbax(path, make_mesh(8), config=TINY)


def test_orbax_legacy_flat_layout_still_loads(tmp_path):
    # round-1 checkpoints were one flat tree; the loader falls back to it
    import os
    ocp = pytest.importorskip("orbax.checkpoint")
    from nbody_tpu.utils.checkpoint import load_world_orbax

    scene = make_galaxies(200, 1, seed=2)
    w = create_world(scene, config=TINY)
    state = w.state
    tree = {
        "pos": state.pos, "vel": state.vel, "acc": state.acc,
        "mass": state.mass, "radius": state.radius,
        "step": np.int64(7), "total_len": np.int64(w.total_len),
        "mass_len": np.int64(w.mass_len),
    }
    path = str(tmp_path / "legacy_ck")
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(os.path.abspath(path), tree, force=True)
    w2, step = load_world_orbax(path, config=TINY)
    assert step == 7 and w2.total_len == w.total_len
    np.testing.assert_array_equal(np.asarray(w2.state.pos),
                                  np.asarray(w.state.pos))


def test_save_world_atomic_overwrites_cleanly(tmp_path):
    """Atomic checkpoint: overwrites the previous file via rename and leaves
    no temp residue in the directory."""
    import os

    from nbody_tpu import create_world, make_galaxies
    from nbody_tpu.utils.checkpoint import load_world, save_world_atomic

    w = create_world(make_galaxies(120, 1, seed=8))
    path = str(tmp_path / "ck.npz")
    save_world_atomic(path, w, step=1)
    w.update(0.01, 2, backend="jnp")
    save_world_atomic(path, w, step=3)
    w2, step = load_world(path)
    assert step == 3
    import numpy as np
    np.testing.assert_array_equal(
        np.asarray(w2.particles.pos), np.asarray(w.particles.pos))
    assert [f for f in os.listdir(tmp_path) if f.startswith(".ckpt-")] == []


def test_save_world_atomic_honors_umask(tmp_path):
    """The temp-file dance must not leak mkstemp's 0600 mode onto the
    checkpoint (group-shared resume workflows read it)."""
    import os
    import stat

    from nbody_tpu import create_world, make_galaxies
    from nbody_tpu.utils import save_world_atomic  # public re-export

    w = create_world(make_galaxies(120, 1, seed=8))
    path = str(tmp_path / "ck.npz")
    old = os.umask(0o022)
    try:
        save_world_atomic(path, w, step=1)
    finally:
        os.umask(old)
    assert stat.S_IMODE(os.stat(path).st_mode) == 0o644


def test_orbax_sharded_resize_via_host_path(tmp_path):
    """Pod-resize recipe: a checkpoint saved on a 4-device mesh restores
    onto an 8-device mesh through the documented host path
    (load_world_orbax -> re-shard), and the resized world carries the same
    state and trajectory."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
    from nbody_tpu.utils.checkpoint import (
        load_world_orbax, save_world_orbax)

    pytest.importorskip("orbax.checkpoint")
    scene = make_galaxies(250, 1, seed=6)
    sw = ShardedWorld(scene, make_mesh(4), config=TINY, force_backend="jnp")
    sw.update(0.01, 3)
    path = str(tmp_path / "ck_resize")
    save_world_orbax(path, sw, step=3)

    w_host, step = load_world_orbax(path)
    assert step == 3
    sw8 = ShardedWorld(w_host.particles, make_mesh(8), config=TINY,
                       force_backend="jnp")
    assert sw8.n_devices == 8
    np.testing.assert_array_equal(np.asarray(sw8.particles.pos),
                                  np.asarray(sw.particles.pos))
    sw.update(0.01, 2)
    sw8.update(0.01, 2)
    np.testing.assert_allclose(np.asarray(sw8.particles.pos),
                               np.asarray(sw.particles.pos), atol=1e-6)



def test_orbax_config_sidecar_restores_sim_config(tmp_path):
    """The save-time SimConfig rides in the checkpoint (config.json), so a
    bare restore rebuilds the exact padded layout — no remembering tile or
    integrator tuning at restore time."""
    import dataclasses

    from nbody_tpu.utils.checkpoint import load_world_orbax, save_world_orbax

    pytest.importorskip("orbax.checkpoint")
    cfg = dataclasses.replace(TINY, integrator="leapfrog", pm_grid=64)
    scene = make_galaxies(250, 1, seed=6)
    w = create_world(scene, config=cfg)
    w.update(0.01, 2, backend="jnp")
    path = str(tmp_path / "ck_cfg")
    save_world_orbax(path, w, step=2)

    resumed, _ = load_world_orbax(path)          # no config passed
    assert resumed.config == cfg
    # an explicit config still wins over the sidecar
    explicit, _ = load_world_orbax(path, config=TINY)
    assert explicit.config == TINY
    # continuation parity: same integrator, same trajectory
    w.update(0.01, 3, backend="jnp")
    resumed.update(0.01, 3, backend="jnp")
    np.testing.assert_allclose(np.asarray(resumed.particles.pos),
                               np.asarray(w.particles.pos), rtol=1e-6)


def test_orbax_config_sidecar_sharded_layout(tmp_path):
    """Sharded restore with config=None uses the sidecar config. The saved
    TINY layout differs from the default config's layout, so this restore
    would fail the n_pad check if the sidecar were ignored."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh, shard_layout
    from nbody_tpu.types import DEFAULT_SIM_CONFIG
    from nbody_tpu.utils.checkpoint import (
        load_sharded_world_orbax, save_world_orbax)

    pytest.importorskip("orbax.checkpoint")
    # N where TINY's 8-particle target tiles and the default 512 pad to
    # different layouts (at tiny N both round to the same 128-alignment)
    scene = make_galaxies(3000, 1, seed=6)
    sw = ShardedWorld(scene, make_mesh(4), config=TINY, force_backend="jnp")
    assert (shard_layout(sw.total_len, sw.mass_len, TINY, 4)
            != shard_layout(sw.total_len, sw.mass_len, DEFAULT_SIM_CONFIG, 4))
    path = str(tmp_path / "ck_cfg_sharded")
    save_world_orbax(path, sw, step=1)

    sw2, step = load_sharded_world_orbax(path, make_mesh(4),
                                         force_backend="jnp")
    assert step == 1 and sw2.config == TINY
    np.testing.assert_array_equal(np.asarray(sw2.pos), np.asarray(sw.pos))


def test_orbax_corrupt_config_sidecar_falls_back(tmp_path):
    """A truncated/garbled config.json degrades to the pre-sidecar default
    config with a warning — never an unloadable checkpoint."""
    from nbody_tpu.types import DEFAULT_SIM_CONFIG
    from nbody_tpu.utils.checkpoint import load_world_orbax, save_world_orbax

    pytest.importorskip("orbax.checkpoint")
    scene = make_galaxies(250, 1, seed=6)
    w = create_world(scene, config=TINY)
    path = str(tmp_path / "ck_corrupt")
    save_world_orbax(path, w, step=0)
    with open(f"{path}/config.json", "w") as f:
        f.write('{"format": 1, "sim_co')  # interrupted copy
    with pytest.warns(UserWarning, match="config sidecar"):
        resumed, _ = load_world_orbax(path)
    assert resumed.config == DEFAULT_SIM_CONFIG


def test_orbax_custom_world_cls_without_config_kwarg(tmp_path):
    """The sidecar is only injected when world_cls accepts config= — a
    custom class without it keeps working against new checkpoints."""
    from nbody_tpu.utils.checkpoint import load_world_orbax, save_world_orbax

    pytest.importorskip("orbax.checkpoint")

    class Bare:
        def __init__(self, particles):
            self.particles = particles

    scene = make_galaxies(250, 1, seed=6)
    w = create_world(scene, config=TINY)
    path = str(tmp_path / "ck_bare")
    save_world_orbax(path, w, step=4)
    bare, step = load_world_orbax(path, world_cls=Bare)
    assert step == 4 and bare.particles.pos.shape == (250, 2)
