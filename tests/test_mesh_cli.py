"""Flagship-CLI multi-chip paths on the 8-device virtual CPU mesh.

The reference's DDP surface (``Density_aware_Chamfer_Distance/train.py:
64-68``) maps to ``cfg.mesh_dp`` x ``cfg.mesh_db``: these tests prove the
*entry points themselves* (``train()``, ``evaluate()``) — not just the
parallel layer — run multi-chip and reproduce single-device numerics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.parallel.mesh import resolve_mesh

pytestmark = pytest.mark.slow  # end-to-end / multi-process tier: run the core loop with -m 'not slow'



def _tiny_cfg(**kw):
    base = dict(batch_size=8, MAX_NUM_PARTS=8, num_target_points=64,
                num_part_points=16, sem_latent_dim=8, source_latent_dim=16,
                target_latent_dim=16, part_latent_dim=16, epochs=1)
    base.update(kw)
    return URedConfig(**base)


def _data(num_targets=16, num_sources=8):
    return synthetic.generate(num_targets=num_targets,
                              num_sources=num_sources, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)


def test_resolve_mesh_default_single_device():
    assert resolve_mesh(_tiny_cfg()) is None


def test_resolve_mesh_explicit_and_auto():
    mesh = resolve_mesh(_tiny_cfg(mesh_dp=4, mesh_db=2))
    assert mesh.shape == {"dp": 4, "db": 2}
    # mesh_dp=0 auto-sizes dp to device_count // db
    mesh = resolve_mesh(_tiny_cfg(mesh_dp=0, mesh_db=2))
    assert mesh.shape["dp"] * 2 == len(jax.devices())


def test_resolve_mesh_rejects_bad_db():
    with pytest.raises(ValueError):
        resolve_mesh(_tiny_cfg(mesh_dp=0, mesh_db=3))


def test_train_cli_mesh_matches_single_device():
    """``train()`` with mesh_dp x mesh_db in the config trains dp4+db2 with
    SyncBN numerics matching the single-device run."""
    from ured_tpu.engine.train import train

    data = _data()
    single_cfg = _tiny_cfg(seed=3)
    _, m_single = train(single_cfg, num_steps=2, data=data)

    mesh_cfg = _tiny_cfg(seed=3, mesh_dp=4, mesh_db=2)
    state, m_mesh = train(mesh_cfg, num_steps=2, data=data)

    a = float(jax.device_get(m_single["all_loss"]))
    b = float(jax.device_get(m_mesh["all_loss"]))
    assert np.isfinite(b)
    # SyncBN + pmean'd grads: same math, f32 reduction-order noise only
    np.testing.assert_allclose(b, a, rtol=5e-3)
    # the state actually lives on the mesh (replicated over all 8 devices)
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_train_cli_mesh_rounds_batch_to_dp():
    from ured_tpu.engine.train import train

    data = _data(num_targets=16)
    cfg = _tiny_cfg(batch_size=6, mesh_dp=4, mesh_db=1)  # 6 -> 4
    _, metrics = train(cfg, num_steps=1, data=data)
    assert np.isfinite(float(jax.device_get(metrics["all_loss"])))


def test_evaluate_cli_mesh_matches_single_device():
    """``evaluate()`` with a mesh: dp-sharded step, db-sharded source DB
    (padded 9 -> 10 with the validity mask), sharded_retrieve_topk — same
    metrics as the single-device run."""
    from ured_tpu.engine.evaluate import evaluate
    from ured_tpu.engine.train import init_state, make_optimizer
    from ured_tpu.models.ured import URED

    data = _data(num_targets=8, num_sources=9)  # 9 % db(2) != 0 -> padding
    cfg = _tiny_cfg()
    cfg.extras["k_candidates"] = 2
    cfg.extras["ndcg_sigma"] = 0.1
    model = URED(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(8), 8).items()}
    tx, _ = make_optimizer(cfg, 1)
    state = init_state(cfg, model, tx, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    want = evaluate(cfg, model, variables, data)

    mesh_cfg = dataclasses.replace(cfg, mesh_dp=4, mesh_db=2,
                                   extras=dict(cfg.extras))
    got = evaluate(mesh_cfg, model, variables, data)

    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)
    # best-of-k contract: the candidate sweep can only improve on top-1
    assert want["best_full_cd_loss"] <= want["cd_loss_top1"] + 1e-6


def test_evaluate_cli_mesh_corpus_eval_matches_single_device():
    """Mesh + ``corpus_eval: true``: the stacked-batch axis shards over all
    8 devices (with the db-padded source DB regathered inside shard_map and
    padded rows masked by num_real_sources) — same metrics as the plain
    single-device run, including the non-divisible remainder batches."""
    from ured_tpu.engine.evaluate import evaluate
    from ured_tpu.engine.train import init_state, make_optimizer
    from ured_tpu.models.ured import URED

    # 20 targets at bs 2 -> 10 batches: 8 sharded over the 2x2 mesh + 2
    # through the per-batch remainder path
    data = _data(num_targets=20, num_sources=9)
    cfg = _tiny_cfg(batch_size=2)
    cfg.extras["ndcg_sigma"] = 0.1
    model = URED(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(8), 8).items()}
    tx, _ = make_optimizer(cfg, 1)
    state = init_state(cfg, model, tx, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    want = evaluate(cfg, model, variables, data)

    mesh_cfg = dataclasses.replace(
        cfg, mesh_dp=2, mesh_db=2,
        extras=dict(cfg.extras, corpus_eval=True))
    got = evaluate(mesh_cfg, model, variables, data)

    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)
