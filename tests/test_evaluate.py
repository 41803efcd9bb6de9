"""Evaluation pipeline + metrics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.engine.evaluate import build_source_db, evaluate, make_eval_step
from ured_tpu.models.ured import URED
from ured_tpu.utils.metrics import dcd_relevance, ndcg_score
import pytest


def _tiny_cfg():
    return URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=64,
                      num_part_points=16, sem_latent_dim=8,
                      source_latent_dim=16, target_latent_dim=16,
                      part_latent_dim=16)


def test_ndcg_perfect_and_inverse():
    rel = np.array([3.0, 2.0, 1.0, 0.0])
    assert ndcg_score(rel, np.array([4, 3, 2, 1]), k=4) == 1.0
    assert ndcg_score(rel, np.array([1, 2, 3, 4]), k=4) < 1.0


def test_ndcg_matches_sklearn():
    from sklearn import metrics as skm

    rng = np.random.default_rng(0)
    rel = rng.uniform(size=30)
    scores = rng.normal(size=30)
    ours = ndcg_score(rel, scores, k=10)
    theirs = skm.ndcg_score([rel.tolist()], [scores.tolist()], k=10)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_ndcg_from_topk_matches_full_scores():
    from ured_tpu.utils.metrics import ndcg_from_topk

    rng = np.random.default_rng(1)
    rel = rng.uniform(size=50)
    scores = rng.normal(size=50)
    k = 12
    topk = np.argsort(-scores)[:k]
    np.testing.assert_allclose(ndcg_from_topk(rel, topk, k=k),
                               ndcg_score(rel, scores, k=k), rtol=1e-12)


def test_ndcg_relevance_uses_target_part_pair_rows():
    """An oracle retriever ranking sources by the target part's own pair
    distances must score NDCG == 1 (reference relevance semantics,
    ``dataset_utils.py:1165-1176``)."""
    from ured_tpu.utils.metrics import ndcg_from_topk

    data = synthetic.generate(num_targets=2, num_sources=12, n_points=64,
                              points_per_part=16, max_parts=8, seed=3)
    t, pi = 0, 0
    rel = dcd_relevance(data.pair_dist[t, pi], sigma=0.1)
    oracle_topk = np.argsort(data.pair_dist[t, pi])[:40]
    assert ndcg_from_topk(rel, oracle_topk, k=40) == 1.0
    # and the pseudo-label is exactly the argmin of the same row
    assert data.label_table[t, pi] == np.argmin(data.pair_dist[t, pi])


def test_dcd_relevance_monotone():
    r = dcd_relevance(np.array([0.0, 0.001, 0.01]), sigma=0.001)
    assert r[0] > r[1] > r[2]


def test_eval_step_and_full_evaluate():
    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=4, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)

    src_db = build_source_db(cfg, model, variables,
                             jnp.asarray(data.src_points),
                             jnp.asarray(data.src_sems),
                             jnp.asarray(data.src_mats), chunk=4)
    assert src_db["codes"].shape == (6, cfg.source_latent_dim)

    step = jax.jit(make_eval_step(cfg, model))
    batch = {"x": jnp.asarray(data.points[:2]),
             "labels": jnp.asarray(data.labels[:2]),
             "tgt_sem": jnp.asarray(data.semantics[:2])}
    out = step(variables, batch, src_db)
    assert out["cd_full"].shape == (2,)
    assert np.isfinite(np.asarray(out["cd_full"])).all()
    assert out["top1"].shape == (2, 8)
    assert np.all(np.asarray(out["top1"]) < 6)

    metrics = evaluate(cfg, model, variables, data)
    for key in ("best_full_cd_loss", "best_full_re_loss", "ndcg@40"):
        assert np.isfinite(metrics[key])


def test_evaluate_split_smaller_than_batch():
    """A split smaller than batch_size shrinks the eval batch instead of
    yielding ZERO drop-remainder batches (found by the CPU micro chain:
    a 2-target test split with bs=4 crashed on an empty concatenate)."""
    cfg = _tiny_cfg()
    cfg.batch_size = 4
    data = synthetic.generate(num_targets=2, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    metrics = evaluate(cfg, model, variables, data)
    assert np.isfinite(metrics["best_full_cd_loss"])


def test_fit_batch_size_respects_mesh_dp():
    """The small-split batch shrink must keep the dp axis even: shrinking
    to the corpus and THEN rounding down to a dp multiple (mirroring the
    train loop), raising a clear error only when the corpus can't fill one
    dp-sharded batch."""
    from ured_tpu.engine.evaluate import _fit_batch_size
    from ured_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=2, db=4)
    assert _fit_batch_size(8, 100, None) == 8
    assert _fit_batch_size(8, 3, None) == 3          # plain shrink
    assert _fit_batch_size(8, 3, mesh) == 2          # shrink + dp rounding
    assert _fit_batch_size(16, 10, mesh) == 10       # 10 % 2 == 0
    assert _fit_batch_size(16, 11, mesh) == 10       # rounds down to even
    with pytest.raises(ValueError, match="mesh_dp"):
        _fit_batch_size(16, 1, mesh)                 # 1 target over dp=2


def test_evaluate_small_split_under_mesh():
    """A split smaller than batch_size evaluates under a dp mesh (the
    shrink used to run after the divisibility guard and crash)."""
    cfg = _tiny_cfg()
    cfg.batch_size = 8
    cfg.mesh_dp, cfg.mesh_db = 2, 1
    data = synthetic.generate(num_targets=3, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    metrics = evaluate(cfg, model, variables, data)
    assert np.isfinite(metrics["best_full_cd_loss"])


def test_corpus_eval_matches_per_batch():
    from ured_tpu.engine.evaluate import make_corpus_eval, stack_batches

    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=4, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    src_db = build_source_db(cfg, model, variables,
                             jnp.asarray(data.src_points),
                             jnp.asarray(data.src_sems),
                             jnp.asarray(data.src_mats), chunk=6)
    corpus_eval = jax.jit(make_corpus_eval(cfg, model))
    batches = stack_batches(data, cfg.batch_size)
    out = corpus_eval(variables, batches, src_db)
    assert out["cd_full"].shape == (2, 2)

    step = jax.jit(make_eval_step(cfg, model))
    single = step(variables, {"x": jnp.asarray(data.points[:2]),
                              "labels": jnp.asarray(data.labels[:2]),
                              "tgt_sem": jnp.asarray(data.semantics[:2])},
                  src_db)
    np.testing.assert_allclose(np.asarray(out["cd_full"][0]),
                               np.asarray(single["cd_full"]), rtol=1e-5)


@pytest.mark.slow  # 1-core lane budget: corpus-dispatch duplicate of test_eval_step_and_full_evaluate
def test_evaluate_corpus_dispatch_matches_per_batch():
    """``corpus_eval: true`` (one lax.map dispatch for the whole split)
    must reproduce the per-batch loop's metrics exactly — including a
    trailing partial batch, which stack_batches drops and evaluate()
    scores separately."""
    import dataclasses

    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=5, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)

    base = evaluate(cfg, model, variables, data)
    cfg_corpus = dataclasses.replace(cfg, extras={"corpus_eval": True})
    fused = evaluate(cfg_corpus, model, variables, data)
    for key in base:
        np.testing.assert_allclose(fused[key], base[key], rtol=1e-5,
                                   err_msg=key)


@pytest.mark.slow
def test_bn_recalibration_recovers_collapsed_stats():
    """Poisoned (collapsed) BatchNorm running variances amplify eval-time
    input shift into 1e8-scale decoder outputs; one recalibration pass over
    the eval distribution must restore finite, sane metrics."""
    import jax

    from ured_tpu.engine.evaluate import evaluate

    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=8, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(4), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    # poison every decoder BN: tiny variance + shifted mean
    def poison(path, leaf):
        keys = jax.tree_util.keystr(path)
        if "param_decoder_full" in keys and "var" in keys:
            return jnp.full_like(leaf, 1e-22)
        if "param_decoder_full" in keys and "mean" in keys:
            return leaf + 3.0
        return leaf

    bs = jax.tree_util.tree_map_with_path(poison, variables["batch_stats"])
    poisoned = {"params": variables["params"], "batch_stats": bs}

    cfg.extras["ndcg_sigma"] = 0.1
    bad = evaluate(cfg, model, poisoned, data, batch_size=4)
    cfg.extras["bn_recalibration_passes"] = 1
    good = evaluate(cfg, model, poisoned, data, batch_size=4)
    assert good["best_full_cd_loss"] < bad["best_full_cd_loss"]
    assert good["best_full_cd_loss"] < 1e3


@pytest.mark.slow  # third corpus-eval compile in this file; the unsharded dispatch and
# per-batch equivalences stay in the fast lane
def test_corpus_eval_sharded_matches_single():
    """make_corpus_eval(mesh=...) shards the stacked-batch axis over all 8
    virtual devices and must match the unsharded program exactly."""
    from ured_tpu.engine.evaluate import make_corpus_eval, stack_batches
    from ured_tpu.parallel import make_mesh

    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=16, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    src_db = build_source_db(cfg, model, variables,
                             jnp.asarray(data.src_points),
                             jnp.asarray(data.src_sems),
                             jnp.asarray(data.src_mats), chunk=6)
    batches = stack_batches(data, cfg.batch_size)      # NB = 8
    plain = make_corpus_eval(cfg, model)(variables, batches, src_db)
    mesh = make_mesh(dp=4, db=2)
    sharded = make_corpus_eval(cfg, model, mesh=mesh)(
        variables, batches, src_db)
    for k in plain:
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(plain[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_ndcg_batch_matches_per_row():
    from ured_tpu.utils.metrics import ndcg_batch, ndcg_from_topk

    rng = np.random.default_rng(5)
    rel = rng.uniform(size=(6, 30))
    scores = rng.uniform(size=(6, 30))
    topk = np.argsort(-scores, axis=-1)[:, :10]
    got = ndcg_batch(rel, topk, k=10)
    want = [ndcg_from_topk(rel[i], topk[i], k=10) for i in range(6)]
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.slow  # ~14 s: bf16 A/B parity (eval default stays f32)
def test_eval_step_bf16_matches_f32():
    """compute_dtype='bfloat16' eval (params stay f32; matmul/chamfer math
    in bf16) must keep the metric contract: finite outputs, top-1 retrieval
    in near-total agreement, cd within bf16 tolerance of the f32 step."""
    data = synthetic.generate(num_targets=4, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=64,
                         num_part_points=16, sem_latent_dim=8,
                         source_latent_dim=16, target_latent_dim=16,
                         part_latent_dim=16, compute_dtype=dt)
        model = URED(cfg)
        init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
            data, np.arange(2), 8).items()}
        # same RNG -> identical f32 params under both compute dtypes
        variables = model.init(jax.random.PRNGKey(0), init_batch,
                               train=False)
        src_db = build_source_db(cfg, model, variables,
                                 jnp.asarray(data.src_points),
                                 jnp.asarray(data.src_sems),
                                 jnp.asarray(data.src_mats))
        step = jax.jit(make_eval_step(cfg, model))
        outs[dt] = step(variables, {
            "x": jnp.asarray(data.points[:2]),
            "labels": jnp.asarray(data.labels[:2]),
            "tgt_sem": jnp.asarray(data.semantics[:2])}, src_db)
    cd32 = np.asarray(outs["float32"]["cd_full"], np.float64)
    cd16 = np.asarray(outs["bfloat16"]["cd_full"], np.float64)
    assert np.isfinite(cd16).all()
    np.testing.assert_allclose(cd16, cd32, rtol=0.15)
    mask = np.asarray(outs["float32"]["part_mask"]) > 0
    agree = (np.asarray(outs["float32"]["top1"])
             == np.asarray(outs["bfloat16"]["top1"]))[mask].mean()
    assert agree >= 0.75
