"""Reference-scale end-to-end run: the full flagship CLI chain on one chip.

Reproduces the reference's live working scale (≈2000 train targets x 6340
source parts, 2048-point targets / 1024-point source parts, 300 epochs —
``engine/test.py:121-139``, ``config/config_train_chair.json``) against the
hermetic synthetic corpus exported as a PartNet-layout tree, and times every
stage of the chain a real user runs:

  generate -> export tree -> pair archives (train+test, on-device fused DCD)
  -> label table -> 300-epoch train -> evaluate (+ best-of-k) -> vis export

Every heavy stage runs in its OWN subprocess.  The parent never imports JAX:
a stage therefore never inherits another stage's device context (train's
optimizer/resident-source buffers and cached executables with baked-in
device constants).  Running evaluate in the same process right after train
hit RESOURCE_EXHAUSTED on the first eval step even after gc+clear_caches —
only a fresh process (fresh backend client) reliably returns the HBM.

Usage:
  python benchmarks/reference_scale.py out.json [--smoke] [--epochs N]

``--smoke`` shrinks to 100 targets x 640 sources / 3 epochs to de-risk the
full run (same code path, minutes instead of hours).  Writes a JSON with
per-stage wall-clock seconds and the final metric trio.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

# every stage child gets this preamble: cooperative SIGTERM (flush +
# release the chip so the next client doesn't hit FAILED_PRECONDITION on a
# half-dead context) and the persistent compile cache (a fresh program on
# a remote-compile backend costs 60-200 s; reruns then hit the cache)
_CHILD_PREAMBLE = """\
import json, os, signal, sys

def _exit(signum, _frame):
    print('[reference_scale stage] SIGTERM: flushing and releasing the chip',
          flush=True)
    raise SystemExit(128 + signum)

signal.signal(signal.SIGTERM, _exit)

import jax
if os.environ.get('URED_CHAIN_CPU'):
    # hermetic CI mode (tests/test_e2e_cli.py micro chains): the session
    # sitecustomize force-registers the remote TPU backend regardless of
    # JAX_PLATFORMS, so stage children must opt out at config level
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/ured_jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
"""

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _in_repo(path: str) -> bool:
    return os.path.abspath(path).startswith(_REPO_ROOT + os.sep)


def _git_commit(paths, msg: str, timeout: float = 1200.0) -> None:
    """Best-effort durability commit of chain artifacts.

    Only git-committed state survives the VM re-images that wiped the
    chain's working tree (and with it the round-3 and round-4 evidence)
    three times: every reboot restores /root/repo from git and nothing
    else.  So after every stage the chain commits its evidence JSON — and
    after the expensive stages, the artifacts themselves (pair archives,
    newest train checkpoint) — so a restart resumes from the last committed
    stage instead of from zero.

    Uses ``git commit -- <paths>`` (pathspec form): concurrent interactive
    work staged in the index is neither committed nor disturbed.  Failures
    (index.lock contention, nothing to commit) are retried then tolerated —
    durability is best-effort, the chain itself must never die here.

    Paths are ``git add``-ed ONE AT A TIME, IN ORDER.  That ordering is
    load-bearing for mid-stage snapshots of the pair job's resume state:
    the job flushes memmap pages BEFORE advancing its ``rows_done`` marker,
    so snapshotting the marker FIRST and the memmaps SECOND guarantees the
    committed marker never claims rows the committed memmaps lack (a
    too-old marker merely recomputes a few finished rows on resume).
    """
    paths = [os.path.abspath(p) for p in paths]
    paths = [p for p in paths if _in_repo(p) and os.path.exists(p)]
    if not paths:
        return
    for attempt in range(5):
        try:
            for p in paths:
                subprocess.run(
                    ["git", "-C", _REPO_ROOT, "add", "-f", "-A", "--", p],
                    check=True, capture_output=True, timeout=timeout)
            r = subprocess.run(
                ["git", "-C", _REPO_ROOT, "commit", "-q",
                 "-m", msg, "--", *paths],
                capture_output=True, text=True, timeout=timeout)
            if r.returncode == 0:
                print(f"[durability] committed: {msg}", flush=True)
            # rc != 0 here means "nothing to commit" — already durable
            return
        except subprocess.TimeoutExpired:
            print(f"[durability] git timed out: {msg}", flush=True)
            return
        except subprocess.CalledProcessError:
            time.sleep(5.0 + 10.0 * attempt)   # index.lock contention
    print(f"[durability] commit failed after retries: {msg}", flush=True)


def _newest_complete_checkpoint(ckpt_root: str):
    """Newest finalized Orbax step dir (has _CHECKPOINT_METADATA), or None."""
    try:
        steps = sorted((int(d) for d in os.listdir(ckpt_root)
                        if d.isdigit()), reverse=True)
    except OSError:
        return None
    for s in steps:
        d = os.path.join(ckpt_root, str(s))
        if os.path.exists(os.path.join(d, "_CHECKPOINT_METADATA")):
            return d
    return None


def _snapshot_partials(pairs_dir: str):
    """Quiesced copies of the pair job's live ``*.partial`` resume dirs.

    Copies each ``<archive>.partial/`` to ``<archive>.partial.snap/`` —
    marker first, memmaps second — and returns the snap paths.  The snap
    is what gets git-committed (hashing the live memmaps fails with
    "unstable object source data"); ``_restore_partial_snaps`` maps a
    committed snap back to the ``.partial`` path the pair job resumes
    from after a VM re-image.
    """
    import glob
    import shutil

    snaps = []
    for part in sorted(glob.glob(os.path.join(pairs_dir, "*.partial"))):
        marker = os.path.join(part, "rows_done")
        if not os.path.exists(marker):
            continue
        snap = part + ".snap"
        tmp = snap + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        try:
            # marker FIRST: the rows it claims were flushed (and never
            # change) before the job advanced it, so copying the memmaps
            # afterwards can only ADD stable rows beyond the claim
            shutil.copy2(marker, os.path.join(tmp, "rows_done"))
            for npy in sorted(glob.glob(os.path.join(part, "*.npy"))):
                shutil.copy2(npy, os.path.join(tmp, os.path.basename(npy)))
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        shutil.rmtree(snap, ignore_errors=True)
        os.replace(tmp, snap)
        snaps.append(snap)
    return snaps


def _restore_partial_snaps(pairs_dir: str) -> None:
    """Rehydrate ``*.partial`` resume dirs from committed ``*.snap`` copies.

    After a VM re-image only git-committed state survives; the pair job
    resumes from ``<archive>.partial/``, which was never committable live.
    If a snap exists and the partial doesn't (or lacks a marker), copy the
    snap back so the job resumes from the snapshot row instead of zero.
    """
    import glob
    import shutil

    for snap in sorted(glob.glob(os.path.join(pairs_dir, "*.partial.snap"))):
        part = snap[: -len(".snap")]
        if os.path.exists(os.path.join(part, "rows_done")):
            continue   # live resume state already present and newer
        shutil.rmtree(part, ignore_errors=True)
        shutil.copytree(snap, part)
        print(f"[durability] restored pair resume state from "
              f"{os.path.basename(snap)}", flush=True)


class _Orchestrator:
    """Runs stage snippets in fresh subprocesses, forwarding SIGTERM."""

    def __init__(self):
        self.terminated = False
        self.child = None
        signal.signal(signal.SIGTERM, self._on_sigterm)

    def _on_sigterm(self, signum, _frame):
        print("[reference_scale] SIGTERM: forwarding to stage child",
              flush=True)
        self.terminated = True
        if self.child is not None and self.child.poll() is None:
            self.child.send_signal(signal.SIGTERM)
        else:
            # no stage in flight — unwind now (dumps incremental timings)
            raise SystemExit(128 + signum)

    def run(self, body):
        """Execute ``body`` (python source) in a fresh interpreter."""
        env = dict(os.environ)
        # children must import ured_tpu; PREPEND the repo root but keep the
        # rest of PYTHONPATH intact (it carries the sitecustomize dir that
        # registers the TPU backend — clobbering it breaks the backend)
        parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        if _REPO_ROOT not in parts:
            parts.insert(0, _REPO_ROOT)
        env["PYTHONPATH"] = os.pathsep.join(parts)
        self.child = subprocess.Popen(
            [sys.executable, "-c", _CHILD_PREAMBLE + body], env=env)
        try:
            rc = self.child.wait()
        finally:
            self.child = None
        if self.terminated:
            # cooperative handoff: the child flushed and exited; release
            # the chip by unwinding (stage context managers dump timings)
            raise SystemExit(143)
        if rc != 0:
            raise RuntimeError(f"stage subprocess failed (rc={rc})")


def main(argv):
    orch = _Orchestrator()
    smoke = "--smoke" in argv
    # positional args = argv minus flags AND their values (a flag value like
    # "--targets 40" must not hijack the output-JSON slot)
    value_flags = {"--epochs", "--targets", "--sources", "--points",
                   "--ppp", "--base", "--bs"}
    args, skip = [], False
    for a in argv[1:]:
        if skip:
            skip = False
        elif a.startswith("--"):
            skip = a in value_flags
        else:
            args.append(a)
    # --partial: the paper's headline partial-target setting (ball/plane
    # occlusion mixture on train targets, ``dataset/partnet_dataset.py:50-58``
    # in the reference) at the same scale.  Shares the base tree + pair
    # archives with the full-target chain (pairs are target-part vs source
    # geometry, independent of train-time occlusion); gets its own log dir,
    # stage sentinels and evidence JSON.
    partial = "--partial" in argv
    out_json = args[0] if args else (
        "reference_scale_smoke.json" if smoke else
        "reference_scale_partial.json" if partial else
        "reference_scale.json")
    epochs = 3 if smoke else 300

    def flag(name, default, cast=int):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    epochs = flag("--epochs", epochs)
    # size overrides (micro chains for CPU de-risking of chain-level code)
    num_targets = flag("--targets", 125 if smoke else 2500)  # 80/20 split
    num_sources = flag("--sources", 640 if smoke else 6340)
    n_points = flag("--points", 2048)
    ppp = flag("--ppp", 1024)
    base = flag("--base", os.path.abspath(
        "ref_scale_smoke_tree" if smoke else "ref_scale_tree"), str)
    log = os.path.join(base, "log_partial" if partial else "log")

    timings = {}
    # a supervisor restart starts a fresh process: carry the per-stage
    # timings a previous attempt already recorded (skipped stages keep
    # their real cost in the final evidence)
    try:
        with open(out_json) as f:
            prior = json.load(f)
        if prior.get("scale", {}).get("targets") == num_targets:
            timings.update(prior.get("stage_seconds") or {})
    except (OSError, ValueError):
        pass
    results = {"scale": {"targets": num_targets, "sources": num_sources,
                         "epochs": epochs, "train_on_partial": partial}}

    def checkpoint_results():
        # incremental dump: a killed/interrupted chain still leaves the
        # per-stage evidence collected so far
        results["stage_seconds"] = timings
        results["total_seconds"] = round(sum(timings.values()), 1)
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)

    ckpt_root = os.path.join(log, "checkpoints")

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.monotonic()
                self.stop = threading.Event()
                # liveness heartbeat: a dead chain must be distinguishable
                # from a running one by reading the evidence file alone
                # (bench.py forwards it).  During the long train stage the
                # heartbeat also commits the newest finished checkpoint
                # every ~25 min so a re-image loses at most that much work.
                def beat():
                    last_ckpt_commit = time.monotonic()
                    last_ckpt_dir = None
                    while not self.stop.wait(60.0):
                        results["heartbeat"] = {
                            "stage": name,
                            "utc": time.strftime(
                                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                            "stage_elapsed_s": round(
                                time.monotonic() - self.t0, 1),
                        }
                        try:
                            with open(out_json, "w") as f:
                                json.dump(results, f, indent=1)
                        except OSError:
                            pass
                        if time.monotonic() - last_ckpt_commit > 1500.0:
                            if name == "train":
                                # commit only the newest FINALIZED step dir —
                                # adding the whole root could pick up a
                                # half-written .orbax-checkpoint-tmp dir
                                d = _newest_complete_checkpoint(ckpt_root)
                                if d and d != last_ckpt_dir:
                                    _git_commit(
                                        [d, out_json],
                                        "chain durability: train checkpoint "
                                        f"{os.path.basename(d)}")
                                    last_ckpt_dir = d
                            elif name.startswith("pair_archive"):
                                # snapshot the row-resumable partials so a
                                # VM re-image mid-way through the chain's
                                # longest stage (~73 min) costs <= 25 min.
                                # git CANNOT add the live memmaps directly —
                                # the job mutates them while git hashes
                                # ("unstable object source data", observed
                                # r5) — so copy to a quiesced *.snap dir
                                # first.  Marker FIRST: rows the job flushed
                                # before advancing the marker never change,
                                # so the copied marker only ever claims
                                # stable rows.
                                # NOT pairs_dir itself: that would stage
                                # the live memmaps and hit the same
                                # unstable-hash failure
                                snaps = _snapshot_partials(pairs_dir)
                                if snaps:
                                    _git_commit(
                                        snaps + [out_json],
                                        "chain durability: "
                                        f"{name} partial rows")
                            last_ckpt_commit = time.monotonic()
                self.thread = threading.Thread(target=beat, daemon=True)
                self.thread.start()
                print(f"=== stage: {name} ===", flush=True)

            def __exit__(self, *exc):
                self.stop.set()
                self.thread.join(timeout=5.0)
                # accumulate across supervisor restarts: a resumed stage's
                # true cost is the sum of its attempts (and a cache-verify
                # rerun must not clobber the original work's timing)
                dt = round(time.monotonic() - self.t0, 1)
                timings[name] = round(timings.get(name, 0.0) + dt, 1)
                print(f"=== {name}: {dt} s (cumulative "
                      f"{timings[name]}) ===", flush=True)
                results["heartbeat"] = {
                    "stage": f"{name}:done" if exc == (None, None, None)
                    else f"{name}:exited",
                    "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "stage_elapsed_s": dt,
                }
                checkpoint_results()
        return _T()

    # per-stage durable artifacts: committed right after the stage's
    # sentinel lands, so a VM re-image never costs more than one stage
    pairs_dir = os.path.join(base, "pairs")
    stage_artifacts = {
        "pair_archive_train": [pairs_dir],
        "pair_archive_test": [pairs_dir],
        "train": [ckpt_root, os.path.join(log, "train.log"),
                  os.path.join(log, "metrics.jsonl")],
    }

    def commit_stage(name):
        t0 = time.monotonic()
        _git_commit(stage_artifacts.get(name, []) + [out_json],
                    f"chain evidence: {name} done "
                    f"({num_targets}x{num_sources}, ep{epochs})")
        dt = round(time.monotonic() - t0, 1)
        if dt > 1.0:
            results["durability_seconds"] = round(
                results.get("durability_seconds", 0.0) + dt, 1)

    # stage 1+2: generate + export (one child — the generated arrays can't
    # cross a process boundary; the child reports the per-stage split).
    # Deterministic (seed=0), ~10 min at full scale: a supervisor restart
    # (benchmarks/supervise.py) skips them when the sentinel says this
    # exact scale was already exported.
    sentinel = os.path.join(base, ".export_done")
    want = f"{num_targets}x{num_sources}x{n_points}x{ppp}"
    done = False
    try:
        done = open(sentinel).read().strip() == want
    except OSError:
        pass
    if done:
        print(f"=== generate/export_tree: cached ({want}) ===", flush=True)
        timings.setdefault("generate", 0.0)
        timings.setdefault("export_tree", 0.0)
    else:
        split_json = os.path.join(base, ".gen_timings.json")
        os.makedirs(base, exist_ok=True)
        print("=== stage: generate+export_tree ===", flush=True)
        orch.run(f"""
import time
from ured_tpu.data import synthetic
t0 = time.monotonic()
data = synthetic.generate(
    num_targets={num_targets}, num_sources={num_sources},
    n_points={n_points}, points_per_part={ppp}, max_parts=16, seed=0)
t1 = time.monotonic()
synthetic.export_partnet_tree(
    data, {base!r}, num_train=int(0.8 * {num_targets}))
t2 = time.monotonic()
with open({split_json!r}, 'w') as f:
    json.dump({{'generate': round(t1 - t0, 1),
                'export_tree': round(t2 - t1, 1)}}, f)
""")
        with open(split_json) as f:
            for k, v in json.load(f).items():
                timings[k] = round(timings.get(k, 0.0) + v, 1)
        checkpoint_results()
        print(f"=== generate+export_tree: {timings['generate']} s + "
              f"{timings['export_tree']} s ===", flush=True)
        with open(sentinel, "w") as f:
            f.write(want)
        commit_stage("export_tree")

    def cfg_dict(mode):
        d = {
            "base_dir": base, "category": "chair",
            "num_source": num_sources, "mode": mode,
            "epochs": epochs, "log_path": log,
            "num_target_points": n_points, "num_part_points": ppp,
            "batch_size": flag("--bs", 16),
            "random_rot": True,
            # restartability under benchmarks/supervise.py: pick the train
            # loop up from the newest full-TrainState checkpoint
            "resume": True,
            "save_epoch": 20,
        }
        if partial and mode == "train":
            # eval stays on FULL targets (the paper's protocol: deform a
            # retrieved full source to a partial observation, score against
            # the complete shape)
            d["train_on_partial"] = True
        if mode == "test":
            d.update({
                "init_dm": True, "init_re": True,
                "dm_model_path": os.path.join(log, "checkpoints"),
                "re_model_path": os.path.join(log, "checkpoints"),
            })
        return d

    os.makedirs(log, exist_ok=True)
    cfg_train = os.path.join(base, "cfg_train.json")
    cfg_test = os.path.join(base, "cfg_test.json")
    with open(cfg_train, "w") as f:
        json.dump(cfg_dict("train"), f)
    with open(cfg_test, "w") as f:
        json.dump(cfg_dict("test"), f)

    # stage-completion sentinels: each heavy stage is internally resumable
    # (row markers, Orbax), but even a no-op resume costs minutes (corpus
    # load + archive re-verify + train-step compile).  A supervisor restart
    # after a LATER stage failed must not pay that again, so a finished
    # stage records a scale-stamped sentinel and is skipped outright.
    stamp = f"{want}@ep{epochs}@bs{flag('--bs', 16)}"
    # per-setting sentinels: the partial chain must not consume (or clobber)
    # the full-target chain's stage markers.  The SHARED pair archives need
    # no sentinel to be reused — their fingerprint cache short-circuits the
    # pair stages in minutes either way.
    done_dir = os.path.join(
        base, ".stage_done_partial" if partial else ".stage_done")
    os.makedirs(done_dir, exist_ok=True)

    def stage_done(name):
        try:
            return open(os.path.join(done_dir, name)).read().strip() == stamp
        except OSError:
            return False

    def mark_stage_done(name):
        with open(os.path.join(done_dir, name), "w") as f:
            f.write(stamp)

    def run_stage(name, body, retries=1, grace_s=60.0):
        if stage_done(name):
            print(f"=== {name}: done (sentinel {stamp}) ===", flush=True)
            timings.setdefault(name, 0.0)
            return
        with stage(name):
            for attempt in range(retries + 1):
                try:
                    orch.run(body)
                    break
                except RuntimeError:
                    # a stage launched right after a heavy predecessor can
                    # find the backend still holding the dead client's HBM
                    # (observed: evaluate RESOURCE_EXHAUSTED seconds after
                    # train exits, while the same stage standalone is
                    # fine).  Give the backend time to reclaim, retry in a
                    # fresh subprocess; only then fail to the supervisor.
                    if attempt >= retries:
                        raise
                    print(f"=== {name}: attempt {attempt + 1} failed; "
                          f"retrying in {grace_s:.0f} s ===", flush=True)
                    time.sleep(grace_s)
        mark_stage_done(name)
        commit_stage(name)

    # stage 3: pair archives (the train CLI would build them lazily; timed
    # separately here because it is the chain's biggest offline cost).
    # After a re-image, rehydrate the row-resume state from the committed
    # mid-stage snapshots; once a stage's final archive is committed the
    # snaps are dead weight in the checkout and are dropped (history keeps
    # them, which is all durability needs).
    _restore_partial_snaps(pairs_dir)
    run_stage("pair_archive_train", f"""
from ured_tpu.data import pairs
pairs.main(['pairs', {cfg_train!r}])
""")
    run_stage("pair_archive_test", f"""
from ured_tpu.data import pairs
pairs.main(['pairs', {cfg_test!r}])
""")
    import glob as _glob
    import shutil as _shutil
    for _snap in _glob.glob(os.path.join(pairs_dir, "*.partial.snap")):
        _shutil.rmtree(_snap, ignore_errors=True)
    _git_commit([pairs_dir], "chain durability: drop pair snapshots "
                "(final archives committed)")

    run_stage("train", f"""
from ured_tpu.engine import train
train.main(['train', {cfg_train!r}])
""")

    metrics_json = os.path.join(base, ".eval_metrics.json")
    run_stage("evaluate", f"""
from ured_tpu.engine import evaluate
m = evaluate.main(['evaluate', {cfg_test!r}])
with open({metrics_json!r}, 'w') as f:
    json.dump(m, f)
""")
    with open(metrics_json) as f:
        results["metrics"] = json.load(f)
    checkpoint_results()
    _git_commit([out_json], "chain evidence: evaluate metric trio "
                f"({num_targets}x{num_sources}, ep{epochs})")

    d = cfg_dict("test")
    d["vis_max_targets"] = 16   # unknown keys land in cfg.extras
    cfg_vis = os.path.join(base, "cfg_vis.json")
    with open(cfg_vis, "w") as f:
        json.dump(d, f)
    vis_json = os.path.join(base, ".vis_metrics.json")
    run_stage("vis", f"""
from ured_tpu.engine import vis
m = vis.main(['vis', {cfg_vis!r}, {os.path.join(base, "vis_out")!r}])
with open({vis_json!r}, 'w') as f:
    json.dump(m, f)
""")
    with open(vis_json) as f:
        results["vis_metrics"] = json.load(f)

    results["heartbeat"] = {
        "stage": "complete",
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    checkpoint_results()
    _git_commit([out_json], "chain evidence: COMPLETE "
                f"({num_targets}x{num_sources}, ep{epochs})")
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv)
