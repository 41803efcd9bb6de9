"""End-of-round benchmark: retrieval+deformation eval throughput on one chip.

Runs the full per-batch eval pipeline (encode target -> per-part pooling ->
cosine retrieval over the source DB -> gather A-matrices -> graph-attention
param decode -> analytic deformation -> masked chamfer -> residual scoring)
at reference chair scale: 2048-point targets, 16-part padding, 512-dim
latents, 512-source DB (reference: 500 chair sources,
``config_train_chair.json:7``).

Prints ONE JSON line.  ``vs_baseline`` is measured throughput divided by the
north-star floor of 4 targets/sec (full 1207-target chair eval in < 5 min on
one v5e chip, BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.engine.evaluate import build_source_db, make_eval_step
    from ured_tpu.models.ured import URED

    # batch 32: device stages are sub-ms, so per-dispatch host latency is
    # the floor — batch wide enough to amortize it
    cfg = URedConfig(batch_size=32)
    num_sources = 512
    num_targets = 64

    data = synthetic.generate(
        num_targets=num_targets, num_sources=num_sources,
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

    src_db = build_source_db(
        cfg, model, variables,
        jnp.asarray(data.src_points), jnp.asarray(data.src_sems),
        jnp.asarray(data.src_mats))

    # per-batch jitted step (make_corpus_eval fuses the whole split into one
    # lax.map program, but its compile is prohibitively slow on remote-
    # compile backends; the per-batch loop is within ~20% at batch 32)
    step = jax.jit(make_eval_step(cfg, model))
    batches = []
    for i in range(0, num_targets, cfg.batch_size):
        batches.append({
            "x": jnp.asarray(data.points[i:i + cfg.batch_size]),
            "labels": jnp.asarray(data.labels[i:i + cfg.batch_size]),
            "tgt_sem": jnp.asarray(data.semantics[i:i + cfg.batch_size]),
        })

    # warmup / compile
    out = step(variables, batches[0], src_db)
    jax.block_until_ready(out["cd_full"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        for b in batches:
            out = step(variables, b, src_db)
    jax.block_until_ready(out["cd_full"])
    dt = time.perf_counter() - t0

    targets_per_sec = iters * num_targets / dt
    baseline_floor = 4.0  # targets/sec implied by the <5 min north star
    print(json.dumps({
        "metric": "retrieval+deform eval throughput (2048-pt targets, "
                  "512-source DB, 16-part padding, 512-dim latents)",
        "value": round(targets_per_sec, 2),
        "unit": "targets/sec/chip",
        "vs_baseline": round(targets_per_sec / baseline_floor, 2),
    }))


if __name__ == "__main__":
    main()
