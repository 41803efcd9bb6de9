"""Input pipeline + partial-target evaluation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.data import io, synthetic
from ured_tpu.data.partnet import PartNetDataset, SourceDB
from ured_tpu.data.pipeline import make_input_pipeline
from ured_tpu.engine.evaluate import (
    build_source_db,
    make_eval_step,
    occlude_eval_batch,
)
from ured_tpu.models.ured import URED


def _dataset(tmp_path, rng, n_targets=6, n_points=64):
    cfg = URedConfig(base_dir=str(tmp_path), category="chair", num_source=4,
                     MAX_NUM_PARTS=4)
    import os

    os.makedirs(str(tmp_path / "generated_datasplits"), exist_ok=True)
    pts = rng.normal(size=(n_targets, n_points, 3)).astype(np.float32)
    lab = rng.integers(0, 3, size=(n_targets, n_points))
    sem = rng.integers(0, 42, size=(n_targets, n_points))
    io.save_targets_h5(
        str(tmp_path / "generated_datasplits" / "chair_4_train.h5"),
        pts, lab, sem, np.arange(n_targets))
    ds = PartNetDataset.from_h5(cfg)
    db = SourceDB(
        points=rng.normal(size=(4, 16, 3)).astype(np.float32),
        mats=rng.normal(size=(4, 48, 6)).astype(np.float32),
        default_params=rng.normal(size=(4, 6)).astype(np.float32),
        sem_ids=np.zeros(4, np.int32), sem_labels=["leg"] * 4,
        model_ids=list("abcd"))
    ds.attach_label_table(rng.integers(-1, 4, size=(n_targets, 4)))
    return ds, db


def test_pipeline_batches(tmp_path, rng):
    ds, db = _dataset(tmp_path, rng)
    it = make_input_pipeline(ds, db, batch_size=2, seed=0, num_epochs=1)
    batches = list(it)
    assert len(batches) == 3
    b = batches[0]
    assert b["x"].shape == (2, 64, 3)
    assert b["src_points"].shape == (2, 4, 16, 3)
    assert b["src_valid"].shape == (2, 4)
    # shuffling covers all targets exactly once per epoch
    seen = np.concatenate([np.asarray(b["model_ids"]).ravel()
                           for b in batches])
    assert sorted(seen.tolist()) == list(range(6))


import pytest


@pytest.mark.slow
def test_pipeline_mp_prefetch_matches_inline(tmp_path, rng):
    """worker_count > 0 (Grain multiprocess prefetch, the torch-DataLoader-
    workers counterpart) yields the same batch stream as the in-process
    path — same seed, same order, same tensors."""
    pytest.importorskip("grain.python")
    ds, db = _dataset(tmp_path, rng)
    inline = list(make_input_pipeline(ds, db, batch_size=2, seed=0,
                                      num_epochs=1))
    mp = list(make_input_pipeline(ds, db, batch_size=2, seed=0,
                                  num_epochs=1, worker_count=1))
    assert len(inline) == len(mp)
    for a, b in zip(inline, mp):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


@pytest.mark.slow  # 1-core lane budget: full partial-eval compile; occlusion generators + partial batch plumbing stay fast
def test_partial_target_eval():
    cfg = URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=64,
                     num_part_points=16, sem_latent_dim=8,
                     source_latent_dim=16, target_latent_dim=16,
                     part_latent_dim=16)
    data = synthetic.generate(num_targets=2, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    src_db = build_source_db(cfg, model, variables,
                             jnp.asarray(data.src_points),
                             jnp.asarray(data.src_sems),
                             jnp.asarray(data.src_mats), chunk=6)
    full = {"x": jnp.asarray(data.points[:2]),
            "labels": jnp.asarray(data.labels[:2]),
            "tgt_sem": jnp.asarray(data.semantics[:2])}
    partial = occlude_eval_batch(full, jax.random.PRNGKey(1))
    assert partial["x"].shape == (2, 32, 3)
    assert partial["labels"].shape == (2, 32)
    step = jax.jit(make_eval_step(cfg, model))
    out = step(variables, partial, src_db)
    assert np.isfinite(np.asarray(out["cd_full"])).all()
    assert np.all(np.asarray(out["top1"]) < 6)
