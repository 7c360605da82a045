"""Fail-fast guard for wedged device backends.

Remote-attached accelerators (e.g. a TPU behind a forwarding tunnel) have a
failure mode the reference's local Vulkan stack cannot: the transport wedges
and the FIRST device touch — even `jax.devices()` — blocks *indefinitely*
inside a futex wait. A user calling `World.particles` or `np.asarray` then
hangs forever with no error (observed live on this image; see
TPU_STATUS_r03.md). `ASSERT_VK`-style abort-on-error (util.h:47-60) is the
reference's analogue: turn an undebuggable stall into an actionable error.

``probe_device`` runs a trivial jitted op in a KILLABLE subprocess (the only
way to bound an indefinite in-process hang) and reports health;
``check_device`` raises ``DeviceUnreachableError`` with the remedy.
``app.py`` calls it before the first device touch when the environment
points at a remote-attached device (`looks_remote_attached`), so CLI users
get an exception in seconds instead of a silent infinite hang.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

__all__ = [
    "DeviceUnreachableError", "check_device", "looks_remote_attached",
    "probe_device",
]


class DeviceUnreachableError(RuntimeError):
    """The device backend did not answer a trivial computation in time."""


# Environment signatures of remote-attached (tunnel/proxy) device
# transports — the only ones with an indefinite-hang failure mode worth a
# mandatory probe. Local CPU/TPU/GPU backends fail fast on their own.
_REMOTE_ENV_VARS = ("PALLAS_AXON_POOL_IPS", "JAX_BACKEND_TARGET")
_REMOTE_PLATFORMS = ("axon", "proxy")


def looks_remote_attached(environ=os.environ) -> bool:
    """True when the environment points jax at a remote-attached device."""
    if any(environ.get(v) for v in _REMOTE_ENV_VARS):
        return True
    plat = environ.get("JAX_PLATFORMS", "")
    return any(p in plat for p in _REMOTE_PLATFORMS)


def probe_device(timeout: float = 240.0, attempts: int = 1,
                 interval: float = 60.0, platform: str | None = None,
                 log=None) -> bool:
    """True once a trivial jitted matmul completes on the backend a fresh
    process would use (optionally forced to ``platform``).

    Runs in a subprocess so a wedged transport is killed at ``timeout``
    instead of hanging the caller forever.
    """
    force = (f"jax.config.update('jax_platforms', {platform!r}); "
             if platform else "")
    code = (f"import jax, jax.numpy as jnp; {force}"
            "print(float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).sum()))")
    for i in range(attempts):
        if i:
            time.sleep(interval)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout)
            if r.returncode == 0:
                return True
            if log:
                log(f"device probe {i + 1}/{attempts}: exit {r.returncode}: "
                    f"{r.stderr.decode(errors='replace').strip()[-200:]}")
        except subprocess.TimeoutExpired:
            if log:
                log(f"device probe {i + 1}/{attempts}: hung > {timeout:.0f}s")
    return False


_probe_passed = False  # one successful probe is good for the process


def check_device(timeout: float = 120.0, attempts: int = 1,
                 platform: str | None = None, log=None) -> None:
    """Raise ``DeviceUnreachableError`` if the device backend is wedged.

    Call before the first device touch in user-facing entry points. A
    successful probe is cached for the process (the guard exists for the
    cold-start wedge; once the backend answered, later hangs are bounded by
    the caller's own computation, not the first touch). Set
    ``NBODY_TPU_NO_PROBE=1`` to skip (e.g. in tightly-packed batch jobs
    where the caller manages its own timeouts).
    """
    global _probe_passed
    if _probe_passed or os.environ.get("NBODY_TPU_NO_PROBE") == "1":
        return
    if probe_device(timeout, attempts, platform=platform, log=log):
        _probe_passed = True
    else:
        raise DeviceUnreachableError(
            f"device backend did not answer a trivial computation within "
            f"{timeout:.0f}s — the transport to a remote-attached device is "
            "down or wedged. Remedies: retry shortly (wedge phases clear on "
            "their own); force CPU with `--platform cpu` (CLI) or "
            "`jax.config.update('jax_platforms', 'cpu')` before any jax "
            "use; or skip this check with NBODY_TPU_NO_PROBE=1."
        )
