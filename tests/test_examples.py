"""Every script in examples/ executed end-to-end with tiny arguments.

Bit-rot guard: the examples are user-facing documentation of the public API
(README points at them), but nothing else imports them, so an API drift
would otherwise go unnoticed until a user hits it. Runs in-process via
runpy so the conftest CPU forcing applies (a subprocess would initialize
the real-accelerator platform).
"""

import os
import runpy
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(name, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [name] + [str(a) for a in argv])
    return runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


def test_collision(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    out = str(tmp_path / "c.gif")
    _run("collision.py", [out, 400, 2], monkeypatch)
    assert open(out, "rb").read(6) in (b"GIF87a", b"GIF89a")


def test_checkpoint_resume(tmp_path, monkeypatch):
    g = _run("checkpoint_resume.py",
             [400, 20, tmp_path / "ck.npz", tmp_path / "tr.npz"], monkeypatch)
    assert g["traj"].shape == (20, 400, 2)
    assert np.isfinite(np.asarray(g["traj"])).all()


def test_pm_million(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    out = str(tmp_path / "pm.gif")
    g = _run("pm_million.py", [4096, 2, "pm", out], monkeypatch)
    assert open(out, "rb").read(6) in (b"GIF87a", b"GIF89a")
    assert np.isfinite(np.asarray(g["world"].particles.pos)).all()


def test_shooting(monkeypatch):
    g = _run("shooting.py", [40], monkeypatch)
    # descent ran: finite loss, and the launch velocity moved off its seed
    assert np.isfinite(float(g["l"]))
    assert not np.allclose(np.asarray(g["v0"]), [10.0, 0.0])


def test_sharded(monkeypatch):
    g = _run("sharded.py", [1024, "--cpu-demo"], monkeypatch)
    sw = g["sw"]
    assert sw.n_devices == 8
    assert np.isfinite(np.asarray(sw.particles.pos)).all()


def test_thrust_control(monkeypatch):
    g = _run("thrust_control.py", [30], monkeypatch)
    # descent ran: objective finite and the schedule moved off zero
    assert np.isfinite(float(g["l"]))
    assert not np.allclose(np.asarray(g["schedule"]), 0.0)


def test_accretion(monkeypatch):
    g = _run("accretion.py", [64, 300], monkeypatch)
    p = g["world"].particles
    assert int((np.asarray(p.mass) > 0).sum()) < 64   # mergers happened
    assert np.isfinite(np.asarray(p.pos)).all()


def test_multihost_pod(monkeypatch):
    # single-process degenerate mode (the real 2-process path runs in
    # test_multihost.py); gather_particles must equal the local gather here
    g = _run("multihost_pod.py", [1024, "--cpu-demo"], monkeypatch)
    parts = g["parts"]
    assert parts.pos.shape == (1024, 2)
    assert np.isfinite(np.asarray(parts.pos)).all()
