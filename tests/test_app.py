"""CLI app end-to-end on CPU: run/save/resume/render/gif subcommands."""

import os

import numpy as np
import pytest

from nbody_tpu.app import main


def test_run_save_render(tmp_path):
    state = str(tmp_path / "state.npz")
    out = str(tmp_path / "frame.ppm")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "5", "--save", state])
    main(["render", "--state", state, "--out", out, "--width", "160", "--height", "120"])
    raw = open(out, "rb").read()
    assert raw.startswith(b"P6\n160 120\n255\n")


def test_run_traj(tmp_path):
    traj = str(tmp_path / "traj.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "8",
          "--frames", "4", "--traj", traj])
    with np.load(traj) as d:
        assert d["traj"].shape == (4, 250, 2)


def test_resume_from_state(tmp_path):
    state = str(tmp_path / "state.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "2", "--save", state])
    state2 = str(tmp_path / "state2.npz")
    main(["run", "--state", state, "--steps", "2", "--save", state2])
    with np.load(state2) as d:
        assert d["pos"].shape == (250, 2)
        # the step counter accumulates across resumed runs (2 + 2)
        assert int(d["step"]) == 4


def test_checkpoint_every_parity_and_resume(tmp_path):
    """--checkpoint-every chunks the run but must land on the identical
    final state, and resuming from its checkpoint keeps counting steps."""
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "5",
          "--save", a, "--checkpoint-every", "2"])
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "5", "--save", b])
    with np.load(a) as da, np.load(b) as db:
        np.testing.assert_array_equal(da["pos"], db["pos"])
        assert int(da["step"]) == 5 == int(db["step"])
    main(["run", "--state", a, "--steps", "3", "--checkpoint-every", "2",
          "--save", a])
    with np.load(a) as d:
        assert int(d["step"]) == 8


def test_gif_export(tmp_path):
    pytest.importorskip("PIL")
    out = str(tmp_path / "anim.gif")
    main(["gif", "--n", "250", "--galaxies", "1", "--frames", "3",
          "--steps-per-frame", "1", "--out", out, "--width", "80", "--height", "60"])
    assert open(out, "rb").read(6) in (b"GIF87a", b"GIF89a")


def test_bad_args_exit():
    with pytest.raises(SystemExit):
        main(["run", "--bogus"])


def test_merge_p3m_combination_rejected_cleanly():
    # unsupported flag combo exits with a CLI error, not a JAX traceback
    with pytest.raises(SystemExit, match="not supported"):
        main(["run", "--n", "400", "--galaxies", "1", "--steps", "1",
              "--merge", "--backend", "p3m"])


def test_pm_grid_auto(tmp_path, capsys):
    """--pm-grid auto resolves through ops.pm_forces.suggest_grid (the
    measured ~sqrt(N) heuristic, clamped to [256, 4096])."""
    from nbody_tpu.ops.pm_forces import suggest_grid

    assert suggest_grid(250) == 256          # lo clamp
    assert suggest_grid(262144) == 512
    assert suggest_grid(1 << 20) == 1024
    assert suggest_grid(1 << 20 | 1) == 2048  # strict next-pow2 of sqrt
    assert suggest_grid(1 << 26) == 4096     # hi clamp
    state = str(tmp_path / "s.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "2",
          "--backend", "pm", "--pm-grid", "auto", "--save", state])
    assert "pm_grid auto -> 256" in capsys.readouterr().err


def test_backend_auto_cli(tmp_path):
    """--backend auto resolves through the scale mux (jnp at tiny N) and
    completes a run end-to-end."""
    state = str(tmp_path / "auto.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "3",
          "--backend", "auto", "--save", state])
    import numpy as np
    with np.load(state) as z:
        assert np.isfinite(z["pos"]).all()


def test_run_sharded_save_and_traj(tmp_path):
    """--shard drives ShardedWorld end-to-end from the CLI: mesh over all
    visible (virtual CPU) devices, checkpoint + fused sharded capture."""
    state = str(tmp_path / "s.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "4",
          "--shard", "--save", state])
    with np.load(state) as d:
        assert d["pos"].shape == (250, 2)
        assert int(d["step"]) == 4

    traj = str(tmp_path / "t.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "6",
          "--frames", "3", "--shard", "--traj", traj])
    with np.load(traj) as d:
        assert d["traj"].shape == (3, 250, 2)


def test_run_sharded_matches_single_chip(tmp_path):
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "5",
          "--shard", "--save", a])
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "5",
          "--save", b])
    with np.load(a) as da, np.load(b) as db:
        scale = max(1.0, float(np.abs(db["pos"]).max()))
        assert np.abs(da["pos"] - db["pos"]).max() / scale < 3e-4


def test_checkpoint_every_negative_rejected():
    import pytest

    with pytest.raises(SystemExit):
        main(["run", "--n", "250", "--galaxies", "1", "--steps", "5",
              "--save", "/tmp/never.npz", "--checkpoint-every", "-2"])


def test_traj_save_counts_only_executed_substeps(tmp_path):
    """--traj rounds steps down to frames*steps_per_frame; the accumulating
    resume counter must record what actually ran (6), not the request (7)."""
    traj = str(tmp_path / "t.npz")
    state = str(tmp_path / "s.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "7",
          "--frames", "3", "--traj", traj, "--save", state])
    with np.load(state) as d:
        assert int(d["step"]) == 6


def test_dt_auto(tmp_path, capsys):
    """--dt auto resolves through diagnostics.suggest_dt on the initial
    accelerations (one dt=0 substep populates acc without moving anything)
    and the resolved value drives the run."""
    state = str(tmp_path / "dtauto.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "3",
          "--dt", "auto", "--save", state])
    err = capsys.readouterr().err
    assert "dt auto -> " in err
    dt = float(err.split("dt auto -> ")[1].split()[0])
    assert 0.0 < dt < 10.0, dt
    with np.load(state) as z:
        assert np.isfinite(z["pos"]).all()


def test_dt_auto_force_free_world_rejected(tmp_path):
    """--dt auto on an all-massless world (no forces, no timescale) must
    exit with a clear error instead of running with dt = inf."""
    from nbody_tpu import make_galaxies
    from nbody_tpu.utils.checkpoint import save_particles

    sc = make_galaxies(250, 1, seed=3)
    sc = type(sc)(pos=sc.pos, vel=sc.vel, acc=sc.acc,
                  mass=np.zeros_like(sc.mass), radius=sc.radius)
    state = str(tmp_path / "massless.npz")
    save_particles(state, sc)
    with pytest.raises(SystemExit, match="force-free"):
        main(["run", "--state", state, "--steps", "1", "--dt", "auto"])


def test_dt_auto_zero_radius_rejected(tmp_path):
    """A zero-radius particle under force has eps = sqrt(radius) = 0, so the
    criterion degenerates to dt = 0 — must be rejected, not run silently."""
    from nbody_tpu import make_galaxies
    from nbody_tpu.utils.checkpoint import save_particles

    sc = make_galaxies(250, 1, seed=3)
    r = np.asarray(sc.radius).copy()
    r[-1] = 0.0  # a massless tracer; it still feels the massive cores
    sc = type(sc)(pos=sc.pos, vel=sc.vel, acc=sc.acc, mass=sc.mass, radius=r)
    state = str(tmp_path / "zr.npz")
    save_particles(state, sc)
    with pytest.raises(SystemExit, match="timescale"):
        main(["run", "--state", state, "--steps", "1", "--dt", "auto"])


def test_resume_inherits_saved_config(tmp_path):
    """A resumed run reproduces the save-time physics by default: the
    checkpoint carries the SimConfig, and flags left at their defaults do
    not clobber it — while an explicitly passed flag still overrides."""
    from nbody_tpu.utils.checkpoint import load_world

    state = str(tmp_path / "state.npz")
    main(["run", "--n", "250", "--galaxies", "1", "--steps", "2",
          "--integrator", "leapfrog", "--pm-softening", "3.5",
          "--save", state])

    # library-level: a bare load_world picks the saved config up
    w, step = load_world(state)
    assert step == 2
    assert w.config.integrator == "leapfrog"
    assert w.config.pm_softening == 3.5

    # CLI resume without flags keeps leapfrog; overriding one flag keeps
    # the rest of the saved config
    s2 = str(tmp_path / "s2.npz")
    main(["run", "--state", state, "--steps", "1", "--save", s2,
          "--pm-softening", "4.0"])
    w2, _ = load_world(s2)
    assert w2.config.integrator == "leapfrog"   # inherited
    assert w2.config.pm_softening == 4.0        # overridden


def test_run_adaptive(tmp_path, capsys):
    out = tmp_path / "ad.npz"
    main(["run", "--n", "300", "--galaxies", "1", "--adaptive", "0.02",
          "--dt", "0.01", "--save", str(out)])
    err = capsys.readouterr().err
    assert "adaptive substeps" in err
    assert out.exists()
    with pytest.raises(SystemExit, match="does not compose"):
        main(["run", "--n", "300", "--galaxies", "1", "--adaptive", "0.02",
              "--traj", str(tmp_path / "t.npz")])


def test_scene_families_via_cli(tmp_path):
    for scene in ("plummer", "kepler", "cold"):
        state = str(tmp_path / f"{scene}.npz")
        main(["run", "--n", "300", "--scene", scene, "--steps", "2",
              "--dt", "0.005", "--save", state])
        with np.load(state) as d:
            assert np.isfinite(d["pos"]).all(), scene


def test_adaptive_bad_span_and_resumed_merge_p3m_rejected(tmp_path):
    with pytest.raises(SystemExit, match="must be > 0"):
        main(["run", "--n", "300", "--galaxies", "1", "--adaptive", "-1"])
    # a resumed merge-enabled checkpoint + --backend p3m is caught on the
    # RESOLVED config, not just the explicit --merge flag
    state = str(tmp_path / "m.npz")
    main(["run", "--n", "300", "--galaxies", "1", "--steps", "1",
          "--merge", "--save", state])
    with pytest.raises(SystemExit, match="not supported"):
        main(["run", "--state", state, "--steps", "1", "--backend", "p3m"])


def test_adaptive_with_dt_auto_and_force_free(tmp_path):
    # --adaptive handles --dt auto itself (criterion re-evaluated per
    # substep; auto = default ceiling) and a force-free world must NOT be
    # rejected — it takes dt_max steps (update_adaptive's inf-criterion
    # contract)
    from nbody_tpu import make_galaxies
    from nbody_tpu.utils.checkpoint import save_particles

    sc = make_galaxies(250, 1, seed=3)
    sc = type(sc)(pos=sc.pos, vel=sc.vel, acc=sc.acc,
                  mass=np.zeros_like(sc.mass), radius=sc.radius)
    state = str(tmp_path / "massless.npz")
    save_particles(state, sc)
    out = str(tmp_path / "out.npz")
    main(["run", "--state", state, "--adaptive", "0.05", "--dt", "auto",
          "--save", out])
    with np.load(out) as d:
        assert np.isfinite(d["pos"]).all()


def test_platform_flag_runs(tmp_path, monkeypatch):
    """--platform cpu is the CLI escape DeviceUnreachableError's remedy
    names (it previously named a flag that did not exist): must parse, pin
    the in-process platform, and skip the remote-device probe. The test
    session already runs on cpu, so the pin is asserted via a config-update
    spy, not the (vacuously cpu) default backend."""
    import jax

    calls = []
    orig = jax.config.update

    def spy(name, value):
        calls.append((name, value))
        orig(name, value)

    monkeypatch.setattr(jax.config, "update", spy)
    state = str(tmp_path / "s.npz")
    main(["--platform", "cpu", "run", "--n", "250", "--galaxies", "1",
          "--steps", "2", "--save", state])
    assert ("jax_platforms", "cpu") in calls
    assert os.path.exists(state)


def test_platform_flag_composes_with_bare_compile_cache(tmp_path,
                                                        monkeypatch):
    """The two wedge-remedy flags must compose: --platform's VALUE ('cpu')
    must not stop the bare --compile-cache preprocessor's scan (review r5:
    it read as 'subcommand reached' and the subcommand got eaten as DIR)."""
    monkeypatch.setenv("NBODY_TPU_CACHE_DIR", str(tmp_path / "cache"))
    state = str(tmp_path / "s.npz")
    main(["--platform", "cpu", "--compile-cache", "run", "--n", "250",
          "--galaxies", "1", "--steps", "1", "--save", state])
    assert os.path.exists(state)
    assert os.path.isdir(str(tmp_path / "cache"))


def test_compile_cache_equals_form_keeps_subcommand_named_dir(tmp_path):
    """A cache DIR that collides with a subcommand name is expressible via
    --compile-cache=DIR (the bare-form heuristic cannot distinguish it
    from the subcommand, as documented in the flag's help)."""
    cache = str(tmp_path / "view")
    state = str(tmp_path / "s.npz")
    main([f"--compile-cache={cache}", "run", "--n", "250", "--galaxies",
          "1", "--steps", "1", "--save", state])
    assert os.path.isdir(cache)
    assert os.path.exists(state)
