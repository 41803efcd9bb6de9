"""Scripted rehearsal of the chain <-> bench chip handoff.

Proves the exact sequence that cost round 3 its headline number can no
longer crash the bench:

  1. launch a smoke-scale reference chain detached (same supervisor, same
     pidfile contract as the real chain),
  2. wait until its child is actively using the chip,
  3. stop it the way ``bench.py`` does (``_stop_conflicting_runs``:
     SIGTERM -> flush -> release, SIGKILL only after the grace window),
  4. acquire the chip the way ``bench.py`` does (``_wait_for_chip``:
     subprocess probes with backoff),
  5. relaunch the chain and check it resumes from its markers.

Exit 0 = the handoff is safe in both directions.  Refuses to run while a
real chain is live (it would stop it).

Usage:  python benchmarks/handoff_rehearsal.py [--keep]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (the machinery under rehearsal)

PIDFILE = "/tmp/refscale.pid"
LOG = "/tmp/rehearsal_chain.log"
OUT = "/tmp/rehearsal_chain.json"
TREE = "/tmp/rehearsal_tree"


def _alive(pid: int) -> bool:
    return os.path.exists(f"/proc/{pid}")


def _launch_smoke_chain() -> int:
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    with open(LOG, "a") as log:
        proc = subprocess.Popen(
            [sys.executable, "benchmarks/supervise.py",
             "--max-restarts", "3", "--",
             sys.executable, "benchmarks/reference_scale.py", OUT,
             "--smoke", "--targets", "40", "--sources", "64",
             "--epochs", "1", "--base", TREE],
            cwd=REPO, env=env, stdout=log, stderr=log,
            start_new_session=True)
    with open(PIDFILE, "w") as f:
        f.write(str(proc.pid))
    return proc.pid


def main(argv):
    try:
        pid = int(open(PIDFILE).read().strip())
    except (OSError, ValueError):
        pid = None
    if pid is not None and _alive(pid):
        cmd = open(f"/proc/{pid}/cmdline").read()
        if "rehearsal" not in cmd:
            print(f"refusing: a real chain is live (pid {pid}); rerun "
                  "after it finishes")
            return 2

    failures = []

    print("[1] launching smoke chain ...", flush=True)
    pid = _launch_smoke_chain()
    # wait for the chain's child to be doing real (device) work
    deadline = time.monotonic() + 600
    child = None
    while time.monotonic() < deadline:
        kids = os.popen(f"ps -o pid= --ppid {pid}").read().split()
        if kids:
            child = int(kids[0])
            if _cpu(child) > 3.0:
                break
        time.sleep(5)
    if child is None:
        failures.append("chain child never appeared")
    print(f"[1] chain pid {pid}, child {child} busy", flush=True)

    print("[2] stopping it the bench way ...", flush=True)
    t0 = time.monotonic()
    stopped = bench._stop_conflicting_runs()
    dt_stop = time.monotonic() - t0
    if not stopped:
        failures.append("_stop_conflicting_runs found nothing to stop")
    if _alive(pid) or (child and _alive(child)):
        failures.append("chain tree survived _stop_conflicting_runs")
    print(f"[2] stopped in {dt_stop:.1f} s", flush=True)

    print("[3] acquiring the chip the bench way ...", flush=True)
    t0 = time.monotonic()
    ready = bench._wait_for_chip(max_wait_s=900)
    dt_probe = time.monotonic() - t0
    if not ready:
        failures.append("_wait_for_chip never succeeded")
    print(f"[3] chip ready in {dt_probe:.1f} s", flush=True)

    print("[4] relaunching + resume check ...", flush=True)
    pid2 = _launch_smoke_chain()
    resumed = False
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        try:
            txt = open(LOG).read()
        except OSError:
            txt = ""
        if ("resuming at row" in txt or "cached (" in txt
                or txt.count("=== stage:") >= 2):
            resumed = True
            break
        if not _alive(pid2):
            break
        time.sleep(5)
    if not resumed:
        failures.append("relaunched chain showed no resume evidence")
    print(f"[4] resume evidence: {resumed}", flush=True)

    if "--keep" not in argv:
        bench._stop_conflicting_runs()
        try:
            os.remove(PIDFILE)
        except OSError:
            pass

    verdict = {"ok": not failures, "failures": failures,
               "stop_seconds": round(dt_stop, 1),
               "acquire_seconds": round(dt_probe, 1)}
    print(json.dumps(verdict))
    return 0 if not failures else 1


def _cpu(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return -1.0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
