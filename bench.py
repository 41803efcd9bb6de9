"""End-of-round benchmark on one chip.  Prints ONE JSON line.

Primary metric: retrieval+deformation eval throughput (the full per-batch
eval pipeline — encode target -> per-part pooling -> cosine retrieval over
the source DB -> gather A-matrices -> graph-attention param decode ->
analytic deformation -> masked chamfer -> residual scoring) at reference
chair scale: 2048-point targets, 16-part padding, 512-dim latents,
512-source DB (reference: 500 chair sources, ``config_train_chair.json:7``).
``extras`` carries the rest of the perf contract: train-step time /
throughput and EMD latency.

Timing methodology: on remote-execution backends ``jax.block_until_ready``
can return before device completion, so every measurement here forces a
device->host VALUE READ of the final output — executions on one device
serialize, so reading the last result bounds the whole timed region.  The
train step is additionally measured as a ``lax.scan`` of 50 steps inside one
program, giving device-only time without per-dispatch host overhead.
"""

import json
import os
import sys
import time

import numpy as np


def _force(out):
    """Device->host read of one leaf: true completion barrier."""
    import jax

    return np.asarray(jax.tree.leaves(out)[0]).ravel()[0]


def encode_db(cfg, model, variables, data):
    import jax.numpy as jnp

    from ured_tpu.engine.evaluate import build_source_db

    return build_source_db(
        cfg, model, variables,
        jnp.asarray(data.src_points), jnp.asarray(data.src_sems),
        jnp.asarray(data.src_mats))


def bench_eval(cfg, model, variables, data, src_db):
    import jax
    import jax.numpy as jnp

    from ured_tpu.engine.evaluate import make_eval_step

    step = jax.jit(make_eval_step(cfg, model))
    num_targets = data.points.shape[0]
    batches = []
    for i in range(0, num_targets, cfg.batch_size):
        batches.append({
            "x": jnp.asarray(data.points[i:i + cfg.batch_size]),
            "labels": jnp.asarray(data.labels[i:i + cfg.batch_size]),
            "tgt_sem": jnp.asarray(data.semantics[i:i + cfg.batch_size]),
        })
    out = step(variables, batches[0], src_db)   # compile
    _force(out["cd_full"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        for b in batches:
            out = step(variables, b, src_db)
    _force(out["cd_full"])
    dt = time.perf_counter() - t0
    return iters * num_targets / dt


def bench_train_step(cfg, model, data, n_steps: int = 50):
    import jax
    import jax.numpy as jnp

    from ured_tpu.data import synthetic
    from ured_tpu.engine.train import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(cfg.batch_size), cfg.MAX_NUM_PARTS).items()}
    tx, _ = make_optimizer(cfg, 1)
    state = init_state(cfg, model, tx, batch)
    inner = make_train_step(cfg, model, tx)

    @jax.jit
    def many(state, batch):
        def body(s, _):
            s, m = inner(s, batch, jnp.asarray(0))
            return s, m["all_loss"]
        s, losses = jax.lax.scan(body, state, None, length=n_steps)
        return s, losses[-1]

    s1, loss = many(state, batch)               # compile + warm
    _force(loss)
    t0 = time.perf_counter()
    _, loss = many(s1, batch)                   # fresh carry: no result reuse
    _force(loss)
    dt = (time.perf_counter() - t0) / n_steps
    return dt


def make_serve_session(cfg, model, variables, src_db,
                       response_keys=None, response_dtype=None):
    from ured_tpu.engine.serve import InferenceSession

    return InferenceSession(cfg, model, variables, src_db,
                            batch_size=cfg.batch_size,
                            response_keys=response_keys,
                            response_dtype=response_dtype)


def bench_serve(sess, data, iters: int = 10):
    """End-to-end serving latency: predict() wall time per batch INCLUDING
    the device->host response transfer — the number a deployment actually
    sees.  A session built with ``response_keys``/``response_dtype``
    projects the payload on device first (the "lean" wire contract for
    network-attached accelerators, where the ~6 MB geometry transfer
    dominates the ~12 ms device step).  Returns (mean ms, requests/sec,
    per-iteration latency list for percentile reporting)."""
    bs = sess.batch_size
    pts = data.points[:bs]
    labels = data.labels[:bs]
    sems = data.semantics[:bs]
    sess.predict(pts, labels, sems)        # compile + warm
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = sess.predict(pts, labels, sems)   # device_get inside
        lat.append(time.perf_counter() - t0)
    dt = sum(lat) / iters
    assert np.isfinite(np.asarray(out["cd_full"], np.float32)).all()
    return dt * 1e3, bs / dt, lat


def bench_serve_device_step(sess, iters: int = 20):
    """Device-only serving step latency: run the session's jitted step and
    read back ONE scalar (a value read is the only true completion barrier
    on this backend, and a scalar's wire cost is nil).  The full-payload
    latency minus this is the response-transfer ("wire") share."""
    import jax.numpy as jnp

    bs, n = sess.batch_size, sess.num_points
    batch = {"x": jnp.zeros((bs, n, 3), jnp.float32),
             "labels": jnp.zeros((bs, n), jnp.int32),
             "tgt_sem": jnp.zeros((bs, n), jnp.int32)}
    out = sess._step(sess.variables, batch, sess.src_db)
    _force(out["cd_full"])
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = sess._step(sess.variables, batch, sess.src_db)
        _force(out["cd_full"])
        lat.append(time.perf_counter() - t0)
    return lat


def bench_emd(n: int = 1024, b: int = 8, iters: int = 5,
              eps: float = 0.005, auction_iters: int = 50):
    import jax
    import jax.numpy as jnp

    from ured_tpu.ops.emd import emd_auction

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(b, n, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(b, n, 3)), jnp.float32)
    f = jax.jit(lambda x, y: emd_auction(x, y, eps, auction_iters)[0])
    _force(f(x, y))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x, y)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _proc_running(pid: int) -> bool:
    """True while the pid exists and is not a zombie (an un-reaped child
    keeps its /proc entry after exiting; it no longer holds the chip)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[1].split()[0] != "Z"
    except (OSError, IndexError):
        return False


def _pid_tree(pid: int):
    import os

    tree = [pid]
    try:
        kids = [int(x) for x in os.popen(
            f"ps -o pid= --ppid {pid}").read().split()]
    except ValueError:
        kids = []
    for k in kids:
        tree.extend(_pid_tree(k))
    return tree


_CHAIN_PIDFILES = ("/tmp/fullscale.pid", "/tmp/refscale.pid",
                   "/tmp/refscale_partial.pid")


def _stop_conflicting_runs(grace_s: float = 120.0,
                           pidfiles=_CHAIN_PIDFILES):
    """Concurrent clients wedge each other on single-chip remote backends
    (FAILED_PRECONDITION / signal-6).  If a long resumable job (the
    reference-scale chain under benchmarks/supervise.py) is live, stop it
    COOPERATIVELY before benching: SIGTERM the supervisor (it forwards a
    SIGTERM to the child, which flushes its row block / checkpoint and
    closes its backend connection), wait for the whole tree to exit, and
    only escalate to SIGKILL after ``grace_s``.  Round 3's SIGKILL +
    1-second-sleep variant left the backend holding the dead client's
    context and the bench died on its first device op — hence this shape.

    Returns the list of pidfiles whose chains were stopped (the caller
    relaunches exactly those via ``benchmarks/launch_chain.sh`` after
    benching — their stages resume from row markers and checkpoints).
    Relaunching only what was stopped matters: blindly starting both the
    full and partial chains would put two clients on the single chip."""
    import os
    import signal
    import time

    stopped = []
    for pidfile in pidfiles:
        try:
            pid = int(open(pidfile).read().strip())
        except (OSError, ValueError):
            continue
        try:  # stale-pidfile safety: only stop the job we actually started
            cmd = open(f"/proc/{pid}/cmdline").read()
        except OSError:
            continue
        if not any(s in cmd for s in ("supervise", "reference_scale",
                                      "wait_and_run")):
            continue
        tree = _pid_tree(pid)
        print(f"bench: asking chain pid {pid} to stop (tree {tree})",
              flush=True)
        try:
            os.kill(pid, signal.SIGTERM)
        except ProcessLookupError:
            continue
        stopped.append(pidfile)
        deadline = time.monotonic() + grace_s
        while time.monotonic() < deadline:
            if not any(_proc_running(p) for p in tree):
                print("bench: chain exited cleanly", flush=True)
                break
            time.sleep(2)
        else:
            for p in reversed(tree):  # leaves first
                try:
                    os.kill(p, signal.SIGKILL)
                    print(f"bench: SIGKILL stubborn pid {p}", flush=True)
                except ProcessLookupError:
                    pass
            time.sleep(3)
    return stopped


def _relaunch_chain(stopped_pidfiles):
    """Resume exactly the chains the bench stopped — ONE at a time.

    If both the full and the partial chain were somehow live, resume only
    the full one (it owns the pidfile the supervisor watches first); the
    partial chain is relaunched manually once the chip is free."""
    import os
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "launch_chain.sh")
    if not os.path.exists(script) or not stopped_pidfiles:
        return
    if "/tmp/refscale.pid" in stopped_pidfiles or \
            "/tmp/fullscale.pid" in stopped_pidfiles:
        subprocess.run(["/bin/sh", script], check=False)
    elif "/tmp/refscale_partial.pid" in stopped_pidfiles:
        subprocess.run(["/bin/sh", script, "--partial"], check=False)


_PROBE_SRC = """
import jax, jax.numpy as jnp, os
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/ured_jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
x = jnp.ones((256, 256))
import numpy as np
assert float(np.asarray((x @ x).sum())) == 256.0 * 256 * 256
print('probe-ok')
"""


def _wait_for_chip(max_wait_s: float = 900.0) -> bool:
    """Poll the backend with a trivial jitted op IN A SUBPROCESS until it
    answers.  A freshly released (or freshly wedged) remote backend can
    refuse the next client for a while — FAILED_PRECONDITION — and a
    poisoned client context cannot recover in-process, so each probe gets
    its own interpreter.  Backoff in minutes, not seconds."""
    import subprocess
    import sys
    import time

    t0 = time.monotonic()
    delay = 10.0
    attempt = 0
    while time.monotonic() - t0 < max_wait_s:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=420)
        except subprocess.TimeoutExpired:
            print(f"bench: chip probe {attempt} timed out", flush=True)
            continue
        if r.returncode == 0 and "probe-ok" in r.stdout:
            print(f"bench: chip ready (probe {attempt}, "
                  f"{time.monotonic() - t0:.0f} s)", flush=True)
            return True
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        print(f"bench: chip probe {attempt} failed rc={r.returncode} "
              f"{tail}; retrying in {delay:.0f} s", flush=True)
        time.sleep(delay)
        delay = min(delay * 2, 120.0)
    return False


def _bf16_step_ms_isolated(timeout_s: float = 2400.0):
    """bf16 train step in its own bounded subprocess; None if unavailable.

    Called by main() strictly AFTER the --run subprocess exits (one TPU
    client at a time — concurrent clients wedge the tunnel chip).  bf16
    programs compile pathologically slowly on the remote-compile backend
    (verify skill notes), so the measurement must not be able to sink the
    whole bench: a timeout/crash here costs only this one extra, never
    the headline JSON line."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--bf16-step"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        print("bench: bf16 step measurement timed out; reporting null",
              file=sys.stderr, flush=True)
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return round(float(line), 2)
        except ValueError:
            continue
    print(f"bench: bf16 step measurement failed rc={r.returncode}",
          file=sys.stderr, flush=True)
    return None


def run_bf16_step():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ured_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED

    cfg = URedConfig(compute_dtype="bfloat16")
    data = synthetic.generate(
        num_targets=16, num_sources=16, n_points=cfg.num_target_points,
        points_per_part=cfg.num_part_points, max_parts=cfg.MAX_NUM_PARTS,
        seed=0)
    print(bench_train_step(cfg, URED(cfg), data) * 1e3, flush=True)
    return 0


def run_bench():
    """The actual measurements.  Runs in a SUBPROCESS of main(): a backend
    failure (e.g. FAILED_PRECONDITION from a still-wedged chip) kills only
    this interpreter; the parent re-probes and retries."""
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the bench compiles several full-scale
    # programs; on remote-compile backends each costs 60-200 s the first
    # time, and reruns (or a prior reference-scale chain with the same
    # shapes) hit the cache instead
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ured_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED

    # batch 32 amortizes per-dispatch host latency over the tunnel for the
    # serving contract; the throughput eval runs at batch 64 — the measured
    # sweet spot of the tunnel's dispatch-latency / HBM trade
    # (benchmarks/onchip_r3.py evalbs: 2860 tps at 64 vs 2745 at 32,
    # 2831 at 128)
    cfg = URedConfig(batch_size=32)
    eval_cfg = URedConfig(batch_size=64)
    data = synthetic.generate(
        num_targets=128, num_sources=512,
        n_points=cfg.num_target_points, points_per_part=cfg.num_part_points,
        max_parts=cfg.MAX_NUM_PARTS, seed=0)

    model = URED(cfg)
    # init on a tiny batch: parameter shapes don't depend on batch/point
    # counts, and the full-scale init compile costs minutes on
    # remote-compile backends
    tiny = synthetic.generate(
        num_targets=1, num_sources=8, n_points=256, points_per_part=64,
        max_parts=cfg.MAX_NUM_PARTS, seed=1)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        tiny, np.arange(1), cfg.MAX_NUM_PARTS).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)

    src_db = encode_db(cfg, model, variables, data)  # encoded ONCE
    eval_tps = bench_eval(eval_cfg, model, variables, data, src_db)
    sess_full = make_serve_session(cfg, model, variables, src_db)
    serve_ms, serve_rps, lat_full = bench_serve(sess_full, data)
    # device-only share of the same full-payload program (scalar readback)
    lat_dev = bench_serve_device_step(sess_full)
    # lean wire contract: ids + params + scalar cd only, floats in bf16
    sess_lean = make_serve_session(
        cfg, model, variables, src_db,
        response_keys=("top1", "params", "cd_full"),
        response_dtype="bfloat16")
    _, serve_lean_rps, lat_lean = bench_serve(sess_lean, data, iters=20)

    def _pct(lat, q):
        return round(float(np.percentile(np.asarray(lat) * 1e3, q)), 1)

    train_cfg = URedConfig()  # reference scale: bs 16, 2048 pts, 512 dims
    train_data = synthetic.generate(
        num_targets=16, num_sources=16,
        n_points=train_cfg.num_target_points,
        points_per_part=train_cfg.num_part_points,
        max_parts=train_cfg.MAX_NUM_PARTS, seed=0)
    step_s = bench_train_step(train_cfg, URED(train_cfg), train_data)
    emd_ms = bench_emd()
    # eval-quality regime (reference emd_module.py:16-19); the auction's
    # convergence early-exit makes the 10k-iteration budget affordable
    emd_eval_ms = bench_emd(iters=3, eps=0.002, auction_iters=10000)

    baseline_floor = 4.0  # targets/sec implied by the <5 min north star
    extras = {
        "train_step_ms": round(step_s * 1e3, 2),
        "train_samples_per_sec": round(train_cfg.batch_size / step_s, 1),
        "emd_1024pt_batch8_ms": round(emd_ms, 1),
        "emd_eval_quality_ms": round(emd_eval_ms, 1),
        "serve_batch_latency_ms": round(serve_ms, 1),
        "serve_requests_per_sec": round(serve_rps, 1),
        "serve_lean_requests_per_sec": round(serve_lean_rps, 1),
        # per-batch latency split (VERDICT r4 item 8): device step vs wire.
        # wire = full-payload latency minus the device-only step (scalar
        # readback) of the SAME program — the serving floor is the device
        # p50; everything above it is response transfer.
        "serve_latency_split_ms": {
            "full_p50": _pct(lat_full, 50), "full_p99": _pct(lat_full, 99),
            "lean_p50": _pct(lat_lean, 50), "lean_p99": _pct(lat_lean, 99),
            "device_p50": _pct(lat_dev, 50), "device_p99": _pct(lat_dev, 99),
            "wire_p50": round(_pct(lat_full, 50) - _pct(lat_dev, 50), 1),
        },
    }
    # surface the latest reference-scale end-to-end chain evidence
    # (benchmarks/reference_scale.py writes it incrementally).  When no
    # evidence file exists the marker is an EXPLICIT "MISSING" — a round
    # without its most important evidence must be visible in the artifact
    # itself, not silently shaped like a round that never tried.
    def _chain_evidence(*names):
        for chain_json in names:
            try:
                with open(os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), chain_json)) as f:
                    chain = json.load(f)
            except (OSError, ValueError):
                continue
            return {
                "scale": chain.get("scale"),
                "stage_seconds": chain.get("stage_seconds"),
                "total_seconds": chain.get("total_seconds"),
                "durability_seconds": chain.get("durability_seconds"),
                "heartbeat": chain.get("heartbeat"),
                "metrics": chain.get("metrics"),
                "vis_metrics": chain.get("vis_metrics"),
            }
        return "MISSING"

    extras["reference_scale_chain"] = _chain_evidence(
        "reference_scale.json", "reference_scale_smoke.json")
    extras["reference_scale_chain_partial"] = _chain_evidence(
        "reference_scale_partial.json")
    print(json.dumps({
        "metric": "retrieval+deform eval throughput (2048-pt targets, "
                  "512-source DB, 16-part padding, 512-dim latents)",
        "value": round(eval_tps, 2),
        "unit": "targets/sec/chip",
        "vs_baseline": round(eval_tps / baseline_floor, 2),
        "extras": extras,
    }))


def _extract_result_line(stdout: str):
    """Last stdout line that parses as the bench's JSON result, or None."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            return line
    return None


def main():
    """Orchestrator: acquire the chip cooperatively, run the measurements in
    an isolated subprocess (retrying through transient backend failures),
    print the single JSON line, and hand the chip back to the chain."""
    import subprocess
    import sys
    import time

    stopped_chain = _stop_conflicting_runs()
    try:
        last_tail = ""
        for attempt in range(1, 4):
            if not _wait_for_chip():
                print("bench: chip never became ready", file=sys.stderr,
                      flush=True)
                continue
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                capture_output=True, text=True, timeout=7200,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            result_line = _extract_result_line(r.stdout)
            if r.returncode == 0 and result_line:
                # sequential follow-up measurement (the --run client has
                # exited, so the chip is free): bf16 train step
                parsed = json.loads(result_line)
                parsed.setdefault("extras", {})["train_step_bf16_ms"] = (
                    _bf16_step_ms_isolated())
                print(json.dumps(parsed))
                return 0
            last_tail = (r.stderr or r.stdout)[-2000:]
            print(f"bench: measurement attempt {attempt} failed "
                  f"(rc={r.returncode}); tail:\n{last_tail}",
                  file=sys.stderr, flush=True)
            time.sleep(30 * attempt)
        print("bench: all measurement attempts failed", file=sys.stderr,
              flush=True)
        return 1
    finally:
        _relaunch_chain(stopped_chain)


if __name__ == "__main__":
    if "--bf16-step" in sys.argv:
        raise SystemExit(run_bf16_step())
    if "--run" in sys.argv:
        raise SystemExit(run_bench())
    raise SystemExit(main())
