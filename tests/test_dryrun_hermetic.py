"""Regression: dryrun_multichip must be hermetic w.r.t. the default backend.

Round-1 failure mode: the driver runs ``dryrun_multichip(8)`` with
JAX_PLATFORMS=cpu in the environment, but a sitecustomize that imports jax at
interpreter start latches a different default platform; the CPU mesh was then
mixed with eager ops on the non-CPU default backend and crashed. The fix pins
``jax_platforms`` before any backend touch, so the dry run must succeed in a
subprocess that reproduces the driver's exact invocation — including whatever
sitecustomize this machine has.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess_like_driver():
    env = dict(os.environ)
    # the driver's environment: forced host device count + cpu request that a
    # sitecustomize may override at interpreter start
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, \
        f"dryrun failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_dryrun_multichip_without_forced_device_count():
    """Even without the driver's XLA_FLAGS the dry run must self-provision
    enough virtual CPU devices."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, \
        f"dryrun failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "dryrun_multichip OK: 4 devices" in proc.stdout
