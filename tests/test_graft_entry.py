"""Regression tests for the driver-facing __graft_entry__ contract.

Round-1's multi-chip dryrun failed because device selection happened after
backend init and ``os.environ.setdefault("XLA_FLAGS", ...)`` silently lost
the virtual-device flag when the driver presets XLA_FLAGS
(MULTICHIP_r01.json).  These tests run the dryrun in fresh subprocesses
under exactly those hostile conditions.
"""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # end-to-end / multi-process tier: run the core loop with -m 'not slow'



def _run_dryrun(n: int, extra_env: dict) -> str:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # breaks the axon backend registration
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def test_dryrun_multichip_with_preset_xla_flags():
    """The exact round-1 failure mode: XLA_FLAGS already set by the driver."""
    out = _run_dryrun(4, {"XLA_FLAGS": "--xla_cpu_enable_fast_math=false"})
    assert "dryrun_multichip ok: mesh=(2,2)" in out, out


def test_dryrun_multichip_with_conflicting_device_count():
    """A preset force_host_platform_device_count must be replaced, not
    duplicated."""
    out = _run_dryrun(
        4, {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    assert "dryrun_multichip ok: mesh=(2,2)" in out, out
