"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.engine.train import init_state, make_optimizer, make_train_step
from ured_tpu.models.ured import URED
from ured_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    retrieve_topk,
    sharded_retrieve_topk,
)


def _tiny_cfg():
    return URedConfig(batch_size=8, MAX_NUM_PARTS=8, num_target_points=64,
                      num_part_points=16, sem_latent_dim=8,
                      source_latent_dim=16, target_latent_dim=16,
                      part_latent_dim=16)


def _data_and_batch(cfg):
    data = synthetic.generate(num_targets=8, num_sources=8, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(8), 8).items()}
    return data, batch


def test_mesh_shapes():
    mesh = make_mesh(db=2)
    assert mesh.shape["dp"] * mesh.shape["db"] == len(jax.devices())


@pytest.mark.slow
def test_sharded_step_dp1_exact_parity():
    """A 1-shard shard_map step is bitwise-equivalent math to the
    single-device step (the world-size-1 fast path of the reference,
    contrast_loss.py:42)."""
    cfg = _tiny_cfg()
    data, batch = _data_and_batch(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    model = URED(cfg)
    state = init_state(cfg, model, tx, batch)

    single = jax.jit(make_train_step(cfg, model, tx))
    s1, m1 = single(state, batch, jnp.asarray(0))

    mesh = make_mesh(dp=1, db=1, devices=jax.devices()[:1])
    step, place = make_sharded_train_step(cfg, model, tx, mesh, explicit=True)
    st, bt, ep = place(state, batch, 0)
    s2, m2 = step(st, bt, ep)

    np.testing.assert_allclose(float(m1["all_loss"]), float(m2["all_loss"]),
                               rtol=1e-5)
    k1 = np.asarray(s1.params["target_encoder_full"]["fc"]["kernel"])
    k2 = np.asarray(s2.params["target_encoder_full"]["fc"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-6)


@pytest.mark.slow
def test_sharded_step_dp8_close_to_single_device():
    """8-way DP differs from single-device only through local-batch
    BatchNorm statistics (like torch DDP without SyncBN) — loss must be
    finite and close."""
    cfg = _tiny_cfg()
    data, batch = _data_and_batch(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    model = URED(cfg)
    state = init_state(cfg, model, tx, batch)

    single = jax.jit(make_train_step(cfg, model, tx))
    _, m1 = single(state, batch, jnp.asarray(0))

    mesh = make_mesh(dp=8, db=1)
    step, place = make_sharded_train_step(cfg, model, tx, mesh, explicit=True)
    st, bt, ep = place(state, batch, 0)
    _, m2 = step(st, bt, ep)

    a, b = float(m1["all_loss"]), float(m2["all_loss"])
    assert np.isfinite(b)
    assert abs(a - b) / abs(a) < 0.35, (a, b)


@pytest.mark.slow  # ~68 s: dp8 exact-parity stress; dp2/2d-mesh cover the fast lane
def test_sharded_step_dp8_syncbn_exact_parity():
    """With SyncBN (batch statistics pmean'd over dp) the 8-way sharded
    step reproduces the single-device numerics, not just approximates them
    — the multi-chip training contract."""
    import dataclasses

    import optax

    cfg = _tiny_cfg()
    data, batch = _data_and_batch(cfg)
    # SGD so parameter deltas are exactly the (lr-scaled) gradients — Adam's
    # rsqrt normalization amplifies float reduction-order noise on
    # near-zero-grad leaves into sign flips, which is optimizer behavior,
    # not a parallelism defect
    tx = optax.sgd(1e-2)
    model = URED(cfg)
    state = init_state(cfg, model, tx, batch)

    single = jax.jit(make_train_step(cfg, model, tx))
    s1, m1 = single(state, batch, jnp.asarray(0))

    sync_cfg = dataclasses.replace(cfg, extras={"sync_bn": True})
    sync_model = URED(sync_cfg)  # same param tree, pmean'd batch stats
    mesh = make_mesh(dp=8, db=1)
    step, place = make_sharded_train_step(sync_cfg, sync_model, tx, mesh,
                                          explicit=True)
    st, bt, ep = place(state, batch, 0)
    s2, m2 = step(st, bt, ep)

    # every loss component matches the global computation
    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)
    # parameters (== init - lr * grad) match within the f32 reduction-order
    # noise floor: permuting the batch order on a SINGLE device already
    # perturbs gradients by ~1.3e-2 (1.3e-4 in params at lr=1e-2), and the
    # sharded-vs-single diffs measured here are the same magnitude
    # (max ~1e-4).  Without SyncBN the LOSS gap alone was 35%.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() < 5e-4, diff.max()
    # running batch stats also agree (pmean'd on both paths)
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.slow  # the heaviest compile in the suite (~50 s cold on the 1-core CI box);
# the same 2d-mesh train step is exercised every round by the driver's
# dryrun_multichip and stays covered in the slow lane
def test_sharded_step_2d_mesh():
    cfg = _tiny_cfg()
    _, batch = _data_and_batch(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    model = URED(cfg)
    state = init_state(cfg, model, tx, batch)
    mesh = make_mesh(dp=4, db=2)
    step, place = make_sharded_train_step(cfg, model, tx, mesh, explicit=True)
    st, bt, ep = place(state, batch, 0)
    s2, m2 = step(st, bt, ep)
    assert np.isfinite(float(m2["all_loss"]))


def test_sharded_retrieval_matches_single(rng):
    q = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    want_s, want_i = retrieve_topk(q, db, k=5)
    mesh = make_mesh(dp=2, db=4)
    got_s, got_i = sharded_retrieve_topk(q, db, k=5, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.slow  # ~20 s: accumulation x sharding composition stress
def test_sharded_step_with_grad_accumulation():
    """grad_accum_steps composes with the sharded step: the MultiSteps
    accumulator state replicates over the mesh, params hold through the
    first micro-step and update on the k-th, exactly as on one device."""
    import dataclasses

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, extras={"sync_bn": True, "grad_accum_steps": 2})
    data, batch = _data_and_batch(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    model = URED(cfg)
    state = init_state(cfg, model, tx, batch)

    mesh = make_mesh(dp=8, db=1)
    step, place = make_sharded_train_step(cfg, model, tx, mesh,
                                          explicit=True)
    st, bt, ep = place(state, batch, 0)
    p0 = np.asarray(jax.device_get(
        st.params["target_encoder_full"]["fc"]["kernel"]))
    st1, m1 = step(st, bt, ep)
    p1 = np.asarray(jax.device_get(
        st1.params["target_encoder_full"]["fc"]["kernel"]))
    np.testing.assert_array_equal(p0, p1)   # accumulating
    st2, m2 = step(st1, bt, ep)
    p2 = np.asarray(jax.device_get(
        st2.params["target_encoder_full"]["fc"]["kernel"]))
    assert not np.array_equal(p1, p2)       # k-th micro-step applies
    assert np.isfinite(float(m2["all_loss"]))


@pytest.mark.slow  # 1-core lane budget: escape-hatch path (retrieval_chunk defaults to None); flat top-k retrieval stays fast
def test_chunked_retrieval_matches_unchunked(rng):
    """The single-device chunked top-k (per-block top-k + merge, the
    in-device form of the sharded merge) is exact at every chunk size,
    including chunk < k, non-dividing chunks, and masked padding rows."""
    q = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(67, 32)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(67,)) > 0.2, jnp.float32)
    for src_valid in (None, valid):
        want_s, want_i = retrieve_topk(q, db, k=7, src_valid=src_valid)
        for chunk in (3, 16, 64, 256):
            got_s, got_i = retrieve_topk(q, db, k=7, src_valid=src_valid,
                                         chunk=chunk)
            np.testing.assert_allclose(np.asarray(got_s),
                                       np.asarray(want_s), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(got_i),
                                          np.asarray(want_i))


def test_contrastive_allgather_consistency():
    """The shard_map path's all_gather'd contrastive loss equals the global
    computation (world-size-1 fast-path equivalence, contrast_loss.py:42)."""
    from ured_tpu.losses import contrastive_loss
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(8, 2, 16)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(8, 2, 16)), jnp.float32)
    v = jnp.ones((8, 2), jnp.float32)

    global_loss = contrastive_loss(f, g, v)

    mesh = make_mesh(dp=8, db=1)

    def local(f, g, v):
        # each shard sees the all_gather'd negatives pool; return its loss
        return contrastive_loss(f, g, v, axis_name="dp").reshape(1)

    local_losses = jax.shard_map(
        local, mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"), check_vma=False)

    # every shard has equal valid counts, so the mean of the per-shard
    # losses equals the global single-device loss
    per = local_losses(f, g, v)
    np.testing.assert_allclose(float(jnp.mean(per)), float(global_loss),
                               rtol=1e-4)


@pytest.mark.slow  # 1-core lane budget: GSPMD duplicate of the shard_map eval path (test_evaluate_small_split_under_mesh stays fast)
def test_eval_step_gspmd_sharded_db():
    """The full eval step under jit with the source DB sharded over the db
    axis and the batch over dp: GSPMD partitions the retrieval matmul and
    the A-matrix gathers; results must match the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ured_tpu.engine.evaluate import build_source_db, make_eval_step

    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=8, num_sources=8, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v)
                  for k, v in synthetic.make_batch(data, np.arange(8),
                                                   8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    src_db = build_source_db(cfg, model, variables,
                             jnp.asarray(data.src_points),
                             jnp.asarray(data.src_sems),
                             jnp.asarray(data.src_mats), chunk=8)
    batch = {"x": jnp.asarray(data.points[:8]),
             "labels": jnp.asarray(data.labels[:8]),
             "tgt_sem": jnp.asarray(data.semantics[:8])}

    step = jax.jit(make_eval_step(cfg, model))
    want = step(variables, batch, src_db)

    mesh = make_mesh(dp=4, db=2)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    db = NamedSharding(mesh, P("db"))
    variables_s = jax.device_put(variables, repl)
    batch_s = {k: jax.device_put(v, dp) for k, v in batch.items()}
    src_db_s = {k: jax.device_put(v, db) for k, v in src_db.items()}
    got = step(variables_s, batch_s, src_db_s)

    np.testing.assert_allclose(np.asarray(got["cd_full"]),
                               np.asarray(want["cd_full"]), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got["top1"]),
                                  np.asarray(want["top1"]))


def test_sharded_retrieval_100k_scale(rng):
    """Exactness of the db-sharded top-k at production DB scale: 100k
    sources over 4 db shards (the 'long axis' of SURVEY.md §5), queries
    sharded over dp."""
    s = 100_000
    q = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(s, 32)), jnp.float32)
    want_s, want_i = retrieve_topk(q, db, k=40)
    mesh = make_mesh(dp=2, db=4)
    got_s, got_i = sharded_retrieve_topk(q, db, k=40, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=1e-5)
    # indices may differ only where scores tie at float resolution
    mism = np.asarray(got_i) != np.asarray(want_i)
    if mism.any():
        ws = np.asarray(want_s)
        gs = np.asarray(got_s)
        np.testing.assert_allclose(gs[mism], ws[mism], atol=1e-6)


def test_sharded_retrieval_uneven_k_vs_shard():
    """k larger than one shard's contribution: merge still exact."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    mesh = make_mesh(dp=1, db=8)   # shard=8 < k=20
    want_s, want_i = retrieve_topk(q, db, k=20)
    got_s, got_i = sharded_retrieve_topk(q, db, k=20, mesh=mesh)
    # per-shard top-k is capped at the shard size (8), so only the global
    # top-(db*kk) winners are recoverable; for k <= shard*db they match
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=1e-5)


@pytest.mark.slow
def test_sharded_step_resident_sources_db_sharded():
    """Resident-source training on a (dp=4, db=2) mesh: the source DB lives
    sharded over the db axis, batches carry only src_idx, and the GSPMD
    cross-shard gather reproduces the pre-gathered batch's step exactly."""
    from ured_tpu.data import corpus

    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=8, num_sources=8, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    c = corpus.from_synthetic(data)
    full = {k: jnp.asarray(v) for k, v in c.make_batch(np.arange(8)).items()}
    light = {k: jnp.asarray(v)
             for k, v in c.make_light_batch(np.arange(8)).items()}
    src_arrays = {"points": jnp.asarray(c.src_points),
                  "sems": jnp.asarray(c.src_sems),
                  "mats": jnp.asarray(c.src_mats)}

    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    model = URED(cfg)
    state = init_state(cfg, model, tx, full)

    mesh = make_mesh(dp=4, db=2)
    step, place = make_sharded_train_step(cfg, model, tx, mesh,
                                          explicit=True,
                                          resident_sources=True)
    st, bt, ep, sa = place(state, light, 0, src_arrays)
    # the source table really is sharded over db
    shard_shapes = {s.data.shape for s in sa["mats"].addressable_shards}
    assert all(sh[0] == c.src_mats.shape[0] // 2 for sh in shard_shapes)
    s_light, m_light = step(st, bt, ep, sa)

    step2, place2 = make_sharded_train_step(cfg, model, tx, mesh,
                                            explicit=True)
    st2, bt2, ep2 = place2(state, full, 0)
    s_full, m_full = step2(st2, bt2, ep2)

    np.testing.assert_allclose(float(m_light["all_loss"]),
                               float(m_full["all_loss"]), rtol=1e-5)
    k1 = np.asarray(s_light.params["target_encoder_full"]["fc"]["kernel"])
    k2 = np.asarray(s_full.params["target_encoder_full"]["fc"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-5)


def test_sharded_pair_matrix_exact():
    """The mesh-sharded pair-archive job (sources striped over all devices,
    chunks scanned on device, one dispatch per row block) matches the
    single-device chunked path exactly — including a ragged source count
    that needs padding to the device stripe."""
    from ured_tpu.data import pairs

    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 16, 3)).astype(np.float32)
    s = rng.normal(size=(11, 16, 3)).astype(np.float32)

    plain = pairs.pair_distance_matrix(q, s, chunk_q=2, chunk_s=2,
                                       progress=False)
    mesh = make_mesh(dp=4, db=2)
    sharded = pairs.pair_distance_matrix(q, s, chunk_q=2, chunk_s=2,
                                         progress=False, mesh=mesh)
    for k in plain:
        np.testing.assert_allclose(sharded[k], plain[k], rtol=1e-5,
                                   atol=1e-7)
