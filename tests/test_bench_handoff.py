"""Unit tests for bench.py's chip-handoff machinery (no device needed).

Round 3's driver bench crashed because chip acquisition SIGKILLed the
reference-scale chain and touched the device 1 s later; these tests lock
the replacement behavior: cooperative SIGTERM stop with an escalation
grace window, stale-pidfile safety, and robust result-line extraction.
The full on-chip sequence is rehearsed by ``benchmarks/handoff_rehearsal.py``.
"""

import json
import os
import subprocess
import sys
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

import bench


def _spawn_fake_chain(tmp_path, name: str, handler: str):
    """A process whose cmdline matches the chain filter ("supervise") and
    signals readiness (handler installed) through a sentinel file."""
    script = tmp_path / f"fake_supervise_{name}.py"
    ready = tmp_path / f"{name}.ready"
    script.write_text(textwrap.dedent(f"""
        import pathlib, signal, sys, time
        def bye(signum, frame):
            sys.exit(0)
        signal.signal(signal.SIGTERM, {handler})
        pathlib.Path({str(ready)!r}).touch()
        time.sleep(600)
    """))
    proc = subprocess.Popen([sys.executable, str(script)])
    deadline = time.monotonic() + 30
    while not ready.exists():
        assert time.monotonic() < deadline, "fake chain never became ready"
        time.sleep(0.05)
    pidfile = tmp_path / f"{name}.pid"
    pidfile.write_text(str(proc.pid))
    return proc, str(pidfile)


def test_cooperative_stop_waits_for_clean_exit(tmp_path):
    proc, pidfile = _spawn_fake_chain(tmp_path, name="a", handler="bye")
    t0 = time.monotonic()
    stopped = bench._stop_conflicting_runs(grace_s=30.0, pidfiles=(pidfile,))
    dt = time.monotonic() - t0
    assert stopped
    assert proc.wait(timeout=5) == 0          # exited via its SIGTERM trap
    assert dt < 25.0                          # did not burn the whole grace


@pytest.mark.slow  # sleeps through the real SIGKILL grace window
def test_stop_escalates_to_sigkill_after_grace(tmp_path):
    proc, pidfile = _spawn_fake_chain(tmp_path, name="stubborn",
                                      handler="signal.SIG_IGN")
    stopped = bench._stop_conflicting_runs(grace_s=4.0, pidfiles=(pidfile,))
    assert stopped
    assert proc.wait(timeout=10) == -9        # SIGKILL escalation


def test_stale_pidfile_is_ignored(tmp_path):
    # a pid that exists but is NOT a chain (this test process) must survive
    pidfile = tmp_path / "stale.pid"
    pidfile.write_text(str(os.getpid()))
    stopped = bench._stop_conflicting_runs(grace_s=2.0, pidfiles=(str(pidfile),))
    assert not stopped
    # and a pidfile pointing at nothing is fine too
    pidfile.write_text("999999999")
    assert not bench._stop_conflicting_runs(grace_s=2.0,
                                            pidfiles=(str(pidfile),))


def test_extract_result_line():
    good = json.dumps({"metric": "x", "value": 1})
    noise = "WARNING: something\nnot json\n" + good + "\ntrailing info"
    assert bench._extract_result_line(noise) == good
    assert bench._extract_result_line("no json here") is None
    # a JSON line without "metric" (e.g. chain evidence) is not the result
    assert bench._extract_result_line(json.dumps({"scale": 1})) is None


def test_bf16_isolated_parses_last_float(monkeypatch):
    """_bf16_step_ms_isolated reads the measurement from the subprocess's
    last float-parseable stdout line and degrades to None on failure
    (timeout or no parseable output) instead of raising."""

    class R:
        def __init__(self, stdout, rc=0):
            self.stdout, self.returncode = stdout, rc

    calls = {}

    def fake_run(cmd, **kw):
        calls["cmd"] = cmd
        return R("warmup chatter\n87.4321\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._bf16_step_ms_isolated() == 87.43
    assert "--bf16-step" in calls["cmd"]

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: R("no numbers here\n", rc=1))
    assert bench._bf16_step_ms_isolated() is None

    def boom(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=1)

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._bf16_step_ms_isolated() is None


def _load_reference_scale_module():
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "benchmarks", "reference_scale.py")
    spec = importlib.util.spec_from_file_location("_refscale", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pair_partial_snapshot_roundtrip(tmp_path):
    """Mid-stage durability: the chain snapshots the pair job's live
    ``*.partial`` resume dirs to quiesced ``*.snap`` copies (git cannot
    hash memmaps that are being written: "unstable object source data"),
    and rehydrates ``.partial`` from ``.snap`` after a VM re-image."""
    import shutil

    import numpy as np

    rs = _load_reference_scale_module()
    pairs_dir = str(tmp_path)
    part = os.path.join(pairs_dir, "a.npz.partial")
    os.makedirs(part)
    np.save(os.path.join(part, "dcd.npy"), np.arange(4.0))
    with open(os.path.join(part, "rows_done"), "w") as f:
        f.write("2")

    snaps = rs._snapshot_partials(pairs_dir)
    assert snaps == [part + ".snap"]
    assert open(os.path.join(snaps[0], "rows_done")).read() == "2"

    # a live partial with a marker wins over the snap
    with open(os.path.join(part, "rows_done"), "w") as f:
        f.write("3")
    rs._restore_partial_snaps(pairs_dir)
    assert open(os.path.join(part, "rows_done")).read() == "3"

    # after a re-image only the committed snap survives
    shutil.rmtree(part)
    rs._restore_partial_snaps(pairs_dir)
    assert open(os.path.join(part, "rows_done")).read() == "2"
    assert np.load(os.path.join(part, "dcd.npy")).tolist() == [0, 1, 2, 3]

    # a marker-less partial dir (created but not yet marked) must not
    # shadow the snap
    os.remove(os.path.join(part, "rows_done"))
    rs._restore_partial_snaps(pairs_dir)
    assert open(os.path.join(part, "rows_done")).read() == "2"
