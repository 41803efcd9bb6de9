"""Round-3 on-chip A/B measurements (run when the TPU tunnel is up).

Usage: python -m benchmarks.onchip_r3 [emd] [retrieval] [serve] [bf16]
(no args = all).  Prints one JSON line per experiment; serialize with any
other TPU job (concurrent clients wedge the tunnel chip).

Experiments:
  emd       — VMEM-resident Pallas auction vs the XLA while_loop auction
              at [8, 1024], train quality (0.005/50) and eval quality
              (0.002/10000).  Calls both paths directly (the env-gated
              dispatch reads URED_EMD_PALLAS at import, so an in-process
              A/B must bypass it).
  retrieval — chunked single-device top-k sweep at [512 q, 100k src, 512d,
              k=40]: chunk in {None, 4096, 8192, 16384, 32768}.
  serve     — InferenceSession batch latency + requests/sec at bench scale.
  bf16      — train step at compute_dtype=bfloat16, post masked-BN rework
              (last measured 82.9 ms; WARNING: bf16 compiles are slow over
              the remote-compile tunnel).
"""

import json
import sys

import numpy as np


def _cache():
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ured_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def run_emd():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import time_fn
    from ured_tpu.ops.chamfer import pairwise_sqdist
    from ured_tpu.ops.emd import _auction_single
    from ured_tpu.ops.emd_pallas import auction_assign_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(8, 1024, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(8, 1024, 3)), jnp.float32)
    cost = jax.jit(pairwise_sqdist)(x, y)

    out = {}
    for name, eps, iters, reps in (("train_q", 0.005, 50, 5),
                                   ("eval_q", 0.002, 10000, 2)):
        xla = jax.jit(lambda c, e=eps, i=iters: jax.vmap(
            _auction_single, in_axes=(0, None, None))(c, e, i))
        pal = jax.jit(lambda c, e=eps, i=iters: auction_assign_pallas(
            c, eps=e, iters=i))
        t_xla = time_fn(xla, cost, iters=reps, warmup=1)
        t_pal = time_fn(pal, cost, iters=reps, warmup=1)
        # sanity: both bijective at eval quality
        a = np.asarray(pal(cost))
        biject = all(len(np.unique(a[b][a[b] >= 0])) == (a[b] >= 0).sum()
                     for b in range(a.shape[0]))
        out[name] = {"xla_ms": round(t_xla * 1e3, 1),
                     "pallas_ms": round(t_pal * 1e3, 1),
                     "speedup": round(t_xla / t_pal, 2),
                     "pallas_bijective_rows": bool(biject)}
    print(json.dumps({"experiment": "emd_auction", **out}))


def run_retrieval():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import time_fn
    from ured_tpu.parallel.retrieval import retrieve_topk

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(512, 512)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(100_000, 512)), jnp.float32)
    res = {}
    base_idx = None
    for chunk in (None, 4096, 8192, 16384, 32768):
        f = jax.jit(lambda a, b, c=chunk: retrieve_topk(a, b, k=40,
                                                        chunk=c))
        t = time_fn(f, q, db, iters=20, warmup=2)
        idx = np.asarray(f(q, db)[1])
        if base_idx is None:
            base_idx = idx
        res[str(chunk)] = {"ms": round(t * 1e3, 2),
                           "exact": bool(np.array_equal(idx, base_idx))}
    print(json.dumps({"experiment": "retrieval_chunk",
                      "shape": "512q x 100k x 512d, k40", **res}))


def run_serve():
    import jax.numpy as jnp

    import bench
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED
    import jax

    cfg = URedConfig(batch_size=32)
    data = synthetic.generate(
        num_targets=64, num_sources=512, n_points=cfg.num_target_points,
        points_per_part=cfg.num_part_points, max_parts=cfg.MAX_NUM_PARTS,
        seed=0)
    model = URED(cfg)
    tiny = synthetic.generate(num_targets=1, num_sources=8, n_points=256,
                              points_per_part=64,
                              max_parts=cfg.MAX_NUM_PARTS, seed=1)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        tiny, np.arange(1), cfg.MAX_NUM_PARTS).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    src_db = bench.encode_db(cfg, model, variables, data)
    sess = bench.make_serve_session(cfg, model, variables, src_db)
    ms, rps, _ = bench.bench_serve(sess, data)
    print(json.dumps({"experiment": "serve",
                      "batch_latency_ms": round(ms, 1),
                      "requests_per_sec": round(rps, 1)}))


def run_bf16():
    import bench
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED

    cfg = URedConfig(compute_dtype="bfloat16")
    data = synthetic.generate(
        num_targets=16, num_sources=16, n_points=cfg.num_target_points,
        points_per_part=cfg.num_part_points, max_parts=cfg.MAX_NUM_PARTS,
        seed=0)
    step_s = bench.bench_train_step(cfg, URED(cfg), data)
    print(json.dumps({"experiment": "train_step_bf16",
                      "ms": round(step_s * 1e3, 1)}))


def run_evalbf16():
    """Eval-pipeline bf16 A/B: throughput + metric agreement vs float32.

    Params are stored float32 either way (flax ``dtype`` is compute-only),
    so both models apply the SAME weights; the A/B isolates the precision
    of the retrieval matmul / decoder / chamfer math."""
    import jax
    import jax.numpy as jnp

    import bench
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.engine.evaluate import build_source_db, make_eval_step
    from ured_tpu.models.ured import URED

    res = {}
    cd = {}
    top1 = {}
    for name in ("float32", "bfloat16"):
        cfg = URedConfig(batch_size=32, compute_dtype=name)
        data = synthetic.generate(
            num_targets=64, num_sources=512, n_points=cfg.num_target_points,
            points_per_part=cfg.num_part_points, max_parts=cfg.MAX_NUM_PARTS,
            seed=0)
        model = URED(cfg)
        tiny = synthetic.generate(num_targets=1, num_sources=8, n_points=256,
                                  points_per_part=64,
                                  max_parts=cfg.MAX_NUM_PARTS, seed=1)
        init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
            tiny, np.arange(1), cfg.MAX_NUM_PARTS).items()}
        variables = model.init(jax.random.PRNGKey(0), init_batch,
                               train=False)
        res[name] = round(bench.bench_eval(cfg, model, variables, data), 1)
        db = build_source_db(
            cfg, model, variables, jnp.asarray(data.src_points),
            jnp.asarray(data.src_sems), jnp.asarray(data.src_mats))
        step = jax.jit(make_eval_step(cfg, model))
        out = step(variables, {
            "x": jnp.asarray(data.points[:32]),
            "labels": jnp.asarray(data.labels[:32]),
            "tgt_sem": jnp.asarray(data.semantics[:32]),
        }, db)
        cd[name] = np.asarray(out["cd_full"], np.float64)
        top1[name] = np.asarray(out["top1"])
        mask = np.asarray(out["part_mask"]) > 0
    agree = float((top1["float32"] == top1["bfloat16"])[mask].mean())
    rel = np.abs(cd["bfloat16"] - cd["float32"]) / np.maximum(
        cd["float32"], 1e-9)
    print(json.dumps({
        "experiment": "eval_bf16",
        "f32_targets_per_sec": res["float32"],
        "bf16_targets_per_sec": res["bfloat16"],
        "speedup": round(res["bfloat16"] / res["float32"], 3),
        "top1_agreement": round(agree, 4),
        "cd_rel_diff_max": round(float(rel.max()), 5),
        "cd_rel_diff_mean": round(float(rel.mean()), 5)}))


def run_dcdpps():
    """Multi-pair grid steps in the fused pair-DCD kernel: pairs_per_step
    in {1, 2, 4, 8, 16} at the archive job's live chunk shape (16 x 64
    pairs of [1024] x [1024] clouds) — does amortizing per-step setup beat
    the one-pair pipeline?"""
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import time_fn
    from ured_tpu.ops.dcd_pallas import pair_dcd_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1024, 1024, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(1024, 1024, 3)), jnp.float32)

    out = {}
    base = None
    for pp in (1, 2, 4, 8, 16):
        f = jax.jit(lambda a, b, pp=pp: pair_dcd_pallas(
            a, b, alpha=1000.0, pairs_per_step=pp)[0])
        t = time_fn(f, x, y, iters=5, warmup=2)
        out[f"pps{pp}_ms"] = round(t * 1e3, 2)
        if pp == 1:
            base = f(x, y)
        else:
            np.testing.assert_allclose(np.asarray(f(x, y)),
                                       np.asarray(base), rtol=1e-6)
    print(json.dumps({"experiment": "dcdpps",
                      "shape": "[1024 pairs, 1024x1024 pts]", **out}))


def run_bnstats():
    """f32 train step: masked-BN stats two_pass vs shifted (one HBM read
    of x per BN instead of two).  Prime suspect for the r02->r04 train-step
    drift (102.0 -> 113.1 ms: masked BN landed in between).  Loss parity is
    property-tested in tests/test_masked_bn.py; this measures the cost."""
    import bench
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED

    out = {}
    for mode in ("two_pass", "shifted"):
        cfg = URedConfig(extras={"bn_stats_mode": mode})
        data = synthetic.generate(
            num_targets=16, num_sources=16, n_points=cfg.num_target_points,
            points_per_part=cfg.num_part_points, max_parts=cfg.MAX_NUM_PARTS,
            seed=0)
        out[f"{mode}_ms"] = round(
            bench.bench_train_step(cfg, URED(cfg), data) * 1e3, 2)
    out["speedup"] = round(out["two_pass_ms"] / out["shifted_ms"], 3)
    print(json.dumps({"experiment": "bnstats_train_step", **out}))


def run_evalbs():
    """Eval-pipeline throughput vs batch size (32 = bench default, 64,
    128): per-dispatch host latency over the tunnel amortizes with batch,
    HBM and compile cost grow."""
    import jax
    import jax.numpy as jnp

    from bench import bench_eval, encode_db
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED

    out = {}
    for bs in (32, 64, 128):
        cfg = URedConfig(batch_size=bs)
        data = synthetic.generate(
            num_targets=128, num_sources=512,
            n_points=cfg.num_target_points,
            points_per_part=cfg.num_part_points,
            max_parts=cfg.MAX_NUM_PARTS, seed=0)
        model = URED(cfg)
        tiny = synthetic.generate(
            num_targets=1, num_sources=8, n_points=256, points_per_part=64,
            max_parts=cfg.MAX_NUM_PARTS, seed=1)
        init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
            tiny, np.arange(1), cfg.MAX_NUM_PARTS).items()}
        variables = model.init(jax.random.PRNGKey(0), init_batch,
                               train=False)
        src_db = encode_db(cfg, model, variables, data)
        out[f"bs{bs}_tps"] = round(
            bench_eval(cfg, model, variables, data, src_db), 1)
    print(json.dumps({"experiment": "evalbs", **out}))


def main(argv):
    _cache()
    which = set(a for a in argv[1:] if not a.startswith("-")) or {
        "emd", "retrieval", "serve", "bf16", "evalbf16"}
    runners = {"emd": run_emd, "retrieval": run_retrieval,
               "serve": run_serve, "bf16": run_bf16,
               "evalbf16": run_evalbf16, "dcdpps": run_dcdpps,
               "evalbs": run_evalbs, "bnstats": run_bnstats}
    for name, fn in runners.items():
        if name not in which:
            continue
        try:
            fn()
        except Exception as e:  # one failed experiment must not eat the rest
            print(json.dumps({"experiment": name, "error": repr(e)[:500]}))


if __name__ == "__main__":
    main(sys.argv)
