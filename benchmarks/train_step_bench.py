"""Train-step timing across precision variants on the real chip.

Run:  python -m benchmarks.train_step_bench [f32 bf16 nochamfer reconly ...]

Methodology: lax.scan of 50 steps inside one program + device->host value
read (see bench.py).  Round-2 baseline: f32 113.9 ms, bf16 93.5 ms.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def step_time(cfg, n_steps: int = 50) -> float:
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import force
    from ured_tpu.data import synthetic
    from ured_tpu.engine.train import (
        init_state,
        make_optimizer,
        make_train_step,
    )
    from ured_tpu.models.ured import URED

    data = synthetic.generate(
        num_targets=cfg.batch_size, num_sources=16,
        n_points=cfg.num_target_points,
        points_per_part=cfg.num_part_points,
        max_parts=cfg.MAX_NUM_PARTS, seed=0)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(cfg.batch_size), cfg.MAX_NUM_PARTS).items()}
    model = URED(cfg)
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

    s1, loss = many(state, batch)
    force(loss)
    t0 = time.perf_counter()
    _, loss = many(s1, batch)
    force(loss)
    return (time.perf_counter() - t0) / n_steps


def main(variants):
    from ured_tpu.config import URedConfig

    for v in variants:
        cfg = URedConfig()  # reference scale: bs16, 2048 pts, 512 dims
        if "bf16" in v:
            cfg.compute_dtype = "bfloat16"
        if "nochamfer" in v:   # ablation: model fwd/bwd without the
            cfg.use_chamfer_loss = 0.0      # distance-matrix loss family
            cfg.use_symmetry_loss = 0.0
            cfg.use_residuals_reg = 0.0
        if "reconly" in v:     # ablation: recon+param losses only
            cfg.use_chamfer_loss = 0.0
            cfg.use_symmetry_loss = 0.0
            cfg.use_residuals_reg = 0.0
            cfg.use_contrast_loss = 0.0
        dt = step_time(cfg)
        print(f"train_step[{v}]: {dt * 1e3:.2f} ms "
              f"({cfg.batch_size / dt:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["f32", "bf16"])
