"""Fast-react stall babysitter for the reference-scale chain.

The axon backend intermittently wedges a dispatch forever (observed
08-20/08-21: a probe's first op hung >600 s while a fresh process
compiled the same op in 29 s; the train stage froze mid-step at step
8580 with the child alive at zero CPU).  ``benchmarks/supervise.py``
already recovers from this, but its honest stall threshold is 30 min
(six 300-s quiet windows) because fresh reference-scale compiles really
are that silent.  Once the persistent compile cache is warm a frozen
child costs the chain ~25 wasted minutes per wedge — this watcher
closes that gap.

Detection (both must hold for the full window):
  * the chain log has not grown (training prints every ~1.2 s; corpus
    loading prints nothing but burns CPU), and
  * the leaf stage child's cumulative CPU time is frozen (<5 s of CPU
    over the window — a loading/compiling child accrues far more).

Action: SIGKILL the LEAF of the supervise -> reference_scale -> stage
process tree, found by walking /proc ppids from the supervisor pidfile
(never by name/pattern matching).  ``run_stage`` retries the stage in a
fresh subprocess; a second failure bubbles to the supervisor, which
restarts the chain (stage sentinels + Orbax checkpoints make that
cheap).

Usage: python benchmarks/babysit_stall.py [--window 270] [--pidfile
/tmp/refscale.pid] [--log ref_scale_tree/chain.log]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _children(pid):
    out = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                fields = f.read().rsplit(")", 1)[1].split()
            if int(fields[1]) == pid:   # ppid is field 4 overall
                out.append(int(p))
        except (OSError, IndexError, ValueError):
            continue
    return out


def _leaf_child(root_pid):
    """Deepest single-chain descendant of root_pid (the stage child)."""
    pid, depth = root_pid, 0
    while depth < 6:
        kids = _children(pid)
        if not kids:
            return pid if pid != root_pid else None
        # follow the newest child (the active stage subprocess)
        pid = max(kids)
        depth += 1
    return pid


def _cputime_s(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            fields = f.read().rsplit(")", 1)[1].split()
        tck = os.sysconf("SC_CLK_TCK")
        return (int(fields[11]) + int(fields[12])) / tck   # utime+stime
    except (OSError, IndexError, ValueError):
        return None


def main(argv):
    def flag(name, default, cast):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    # default 600 s: comfortably above every observed healthy-but-silent
    # remote compile this session (147 s train step; smoke eval programs
    # each < 5 min) yet 3x faster than the supervisor's 30-min budget
    window = flag("--window", 600.0, float)
    pidfile = flag("--pidfile", "/tmp/refscale.pid", str)
    log_path = flag("--log", os.path.join(REPO, "ref_scale_tree",
                                          "chain.log"), str)
    last_size, last_cpu, quiet_since = -1, None, None
    while True:
        time.sleep(30.0)
        try:
            sup = int(open(pidfile).read().strip())
            os.kill(sup, 0)
        except (OSError, ValueError):
            quiet_since = None
            continue    # chain not running; nothing to babysit
        leaf = _leaf_child(sup)
        cpu = _cputime_s(leaf) if leaf else None
        try:
            size = os.path.getsize(log_path)
        except OSError:
            size = -1
        now = time.monotonic()
        grew = size != last_size
        burned = (cpu is not None and last_cpu is not None
                  and cpu - last_cpu > 5.0)
        if grew or burned or leaf is None:
            quiet_since = None
        elif quiet_since is None:
            quiet_since = now
        elif now - quiet_since > window:
            print(f"[babysit] stall: log static + cpu frozen for "
                  f"{now - quiet_since:.0f} s; killing stage child "
                  f"{leaf}", flush=True)
            try:
                os.kill(leaf, 9)
            except OSError:
                pass
            quiet_since = None
        last_size, last_cpu = size, cpu


if __name__ == "__main__":
    main(sys.argv[1:])
