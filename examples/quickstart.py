"""End-to-end quickstart on the hermetic synthetic corpus.

Runs the whole U-RED capability surface in one file — train a few epochs,
evaluate the metric trio, export a deformed assembly, and serve requests —
with no dataset on disk (the synthetic corpus runs the identical code path
as a PartNet-layout tree; point ``base_dir`` at real data to switch).

    python examples/quickstart.py          # ~2 min on CPU, seconds on TPU
"""

import os
import tempfile

import numpy as np


def main():
    from ured_tpu.config import URedConfig
    from ured_tpu.engine.evaluate import evaluate, restore_eval_variables
    from ured_tpu.engine.serve import InferenceSession
    from ured_tpu.engine.train import resolve_corpus, train
    from ured_tpu.engine.vis import run_vis

    work = tempfile.mkdtemp(prefix="ured_quickstart_")

    # small dims so the demo is quick everywhere; drop these overrides to
    # run at the reference scale (2048 pts, 512-dim latents, 16 parts)
    cfg = URedConfig(
        batch_size=4, epochs=8, MAX_NUM_PARTS=8, num_target_points=128,
        num_part_points=32, sem_latent_dim=8, source_latent_dim=32,
        target_latent_dim=32, part_latent_dim=32,
        log_path=os.path.join(work, "log"))
    cfg.extras.update(synthetic_targets=16, synthetic_sources=12)

    # 1. train (jitted 7-loss step; Orbax checkpoints under log/checkpoints)
    ckpt = os.path.join(work, "ckpt")
    state, metrics = train(cfg, checkpoint_dir=ckpt, log_every=4)
    print(f"trained: loss {float(metrics['all_loss']):.3f}")

    # 2. evaluate the reference metric trio from the checkpoint
    cfg.init_dm = cfg.init_re = True
    cfg.dm_model_path = cfg.re_model_path = ckpt
    data = resolve_corpus(cfg)
    cfg.extras.setdefault("ndcg_sigma", 0.1)   # synthetic distance scale
    model, variables = restore_eval_variables(cfg, data)
    evaluate(cfg, model, variables, data)

    # 3. export deformed assemblies (the reference vis.py OBJ path)
    out = run_vis(cfg, model, variables, data, data,
                  os.path.join(work, "vis"), max_targets=4)
    print(f"vis: {out}")

    # 4. serve requests through the same eval step
    session = InferenceSession.from_config(cfg, data=data)
    b = data.make_batch(np.arange(3))
    resp = session.predict(b["x"], b["labels"], b["tgt_sem"])
    print(f"served 3 requests: mean cd {resp['cd_full'].mean():.4f}, "
          f"retrieved sources {resp['top1'][:, 0]}")
    print(f"artifacts under {work}")


if __name__ == "__main__":
    main()
