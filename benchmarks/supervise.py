"""Stall watchdog: run a command, restart it when it stops making progress.

Remote-execution TPU backends can wedge a client forever on one RPC (the
HTTP call never returns; the process sleeps at 0% CPU).  This supervisor
watches the child's cumulative CPU time and restarts it after a
configurable run of quiet windows — paired with the resumable stages in
``benchmarks/reference_scale.py`` (pair-archive row memmaps, Orbax
train-state resume), a restart loses at most one row block / one
checkpoint interval instead of the whole run.

Usage:
  python benchmarks/supervise.py [--window SEC] [--quiet-windows N]
      [--max-restarts R] -- <command...>

A window is "quiet" when the child gains < 1 CPU-second in it.  The
default 4 x 150 s tolerates legitimate zero-CPU phases (server-side XLA
compiles run 60-240 s) while bounding a wedge at ~10 minutes.
"""

import os
import signal
import subprocess
import sys
import time


def _cpu_seconds(pid: int) -> float:
    """Cumulative CPU of ``pid``'s whole process subtree.

    The chain orchestrator (benchmarks/reference_scale.py) runs each stage
    in its own subprocess and itself idles in ``wait()`` — sampling only the
    direct child's utime/stime would read ~0 and false-positive a stall
    while a stage grandchild is hard at work.  Sum the live descendants'
    own time plus each process's reaped-children time (cutime/cstime, which
    absorbs completed stage subprocesses)."""
    # one /proc pass: stat fields for every live pid + a ppid->children map
    stats, kids = {}, {}
    try:
        live = [int(d) for d in os.listdir("/proc") if d.isdigit()]
    except OSError:
        return -1.0
    for p in live:
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            own = (int(parts[11]) + int(parts[12])  # utime + stime
                   + int(parts[13]) + int(parts[14]))  # + reaped children
            stats[p] = own
            kids.setdefault(ppid, []).append(p)
        except (OSError, IndexError, ValueError):
            continue  # raced exit of an unrelated process
    if pid not in stats:
        return -1.0
    total, frontier = 0, [pid]
    while frontier:
        p = frontier.pop()
        total += stats.get(p, 0)
        frontier.extend(kids.get(p, ()))
    return total / os.sysconf("SC_CLK_TCK")


def main(argv):
    window = 150.0
    quiet_windows = 4
    max_restarts = 8
    if "--" not in argv:
        print(__doc__)
        return 2
    sep = argv.index("--")
    opts, cmd = argv[1:sep], argv[sep + 1:]
    it = iter(opts)
    for o in it:
        if o == "--window":
            window = float(next(it))
        elif o == "--quiet-windows":
            quiet_windows = int(next(it))
        elif o == "--max-restarts":
            max_restarts = int(next(it))
        else:
            raise SystemExit(f"unknown option {o}")

    child = None

    def forward(signum, _frame):
        # cooperative handoff: give the child time to flush row blocks /
        # checkpoints and close its backend connection (a SIGKILLed client
        # leaves the remote single-chip backend wedged for the next one)
        if child and child.poll() is None:
            child.terminate()
            deadline = time.monotonic() + 90.0
            while child.poll() is None and time.monotonic() < deadline:
                time.sleep(0.5)
            if child.poll() is None:
                print("[supervise] child ignored SIGTERM for 90 s: killing",
                      flush=True)
                child.kill()
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, forward)
    signal.signal(signal.SIGINT, forward)

    restarts = 0
    while True:
        print(f"[supervise] start (attempt {restarts + 1}): "
              f"{' '.join(cmd)}", flush=True)
        child = subprocess.Popen(cmd)
        last_cpu = 0.0
        quiet = 0
        while True:
            try:
                child.wait(timeout=window)
                break
            except subprocess.TimeoutExpired:
                pass
            cpu = _cpu_seconds(child.pid)
            if cpu < 0:
                continue        # raced exit; wait() will catch it
            if cpu - last_cpu < 1.0:
                quiet += 1
                print(f"[supervise] quiet window {quiet}/{quiet_windows} "
                      f"(cpu {cpu:.0f}s)", flush=True)
            else:
                quiet = 0
            last_cpu = cpu
            if quiet >= quiet_windows:
                print("[supervise] stalled: killing child", flush=True)
                child.kill()
                child.wait()
                break
        rc = child.returncode
        if rc == 0:
            print("[supervise] child finished ok", flush=True)
            return 0
        restarts += 1
        if restarts > max_restarts:
            print(f"[supervise] giving up after {max_restarts} restarts "
                  f"(last rc {rc})", flush=True)
            return 1
        print(f"[supervise] child rc {rc}; restarting in 15 s", flush=True)
        time.sleep(15)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
