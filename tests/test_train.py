"""End-to-end train-step tests on the synthetic corpus (the reference's
integration testing was 'run the entry points on real data', SURVEY.md §4;
here it is hermetic)."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.engine.train import (
    init_state,
    make_optimizer,
    make_train_step,
    train,
)
from ured_tpu.models.ured import URED
import pytest

pytestmark = pytest.mark.slow  # end-to-end / multi-process tier: run the core loop with -m 'not slow'



def _tiny_cfg(**kw):
    base = dict(batch_size=4, MAX_NUM_PARTS=8, num_target_points=64,
                num_part_points=16, sem_latent_dim=8, source_latent_dim=16,
                target_latent_dim=16, part_latent_dim=16, epochs=1)
    base.update(kw)
    return URedConfig(**base)


def test_synthetic_generator_invariants():
    data = synthetic.generate(num_targets=4, num_sources=6, n_points=128,
                              points_per_part=32, max_parts=8, seed=1)
    assert data.points.shape == (4, 128, 3)
    assert data.src_mats.shape == (6, 96, 6)
    # A @ default == points for every source
    for s in range(6):
        rec = (data.src_mats[s] @ data.src_default[s]).reshape(-1, 3)
        np.testing.assert_allclose(rec, data.src_points[s], atol=1e-4)
    # labels are contiguous part ids < num_parts
    for t in range(4):
        assert data.labels[t].max() == data.num_parts[t] - 1
    # pseudo-labels are same-semantic
    for t in range(4):
        for p in range(data.num_parts[t]):
            s = data.label_table[t, p]
            assert data.src_sems[s] == data.part_sems[t, p]


def test_train_step_decreases_loss():
    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=8, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    tx, _ = make_optimizer(cfg, steps_per_epoch=2)
    model = URED(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(4), 8).items()}
    state = init_state(cfg, model, tx, batch)
    step = jax.jit(make_train_step(cfg, model, tx))

    state, m0 = step(state, batch, jnp.asarray(0))
    first = float(m0["all_loss"])
    for _ in range(12):
        state, m = step(state, batch, jnp.asarray(0))
    last = float(m["all_loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_embedding_layer_frozen():
    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=4, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    model = URED(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(4), 8).items()}
    state = init_state(cfg, model, tx, batch)
    emb0 = state.params["embedding_layer"]["embedding"]
    step = jax.jit(make_train_step(cfg, model, tx))
    state, _ = step(state, batch, jnp.asarray(0))
    # reference excludes the embedding from its optimizer
    # (train_utils/optimizer_dm.py:82-84)
    np.testing.assert_array_equal(
        np.asarray(emb0),
        np.asarray(state.params["embedding_layer"]["embedding"]))
    # but other modules did move
    k0 = np.asarray(
        state.params["target_encoder_full"]["fc"]["kernel"])
    assert not np.allclose(k0, 0)


def test_train_loop_smoke():
    cfg = _tiny_cfg()
    cfg.extras["synthetic_targets"] = 8
    cfg.extras["synthetic_sources"] = 6
    state, metrics = train(cfg, num_steps=3, log_every=100)
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["all_loss"]))


def test_train_resume_from_checkpoint(tmp_path):
    """The `resume` extra restores the newest full-TrainState checkpoint and
    skips the epochs it covers — an interrupted run continues instead of
    restarting (capability the reference lacks: its checkpoints drop
    optimizer state, ref train.py:349-358)."""
    cfg = _tiny_cfg()
    cfg.extras["synthetic_targets"] = 8
    cfg.extras["synthetic_sources"] = 6
    cfg.epochs = 2
    cfg.save_epoch = 1
    ckpt = str(tmp_path / "ck")

    # uninterrupted 2-epoch run (4 steps at bs covering 8 targets -> 2/epoch)
    full_state, _ = train(cfg, log_every=100, checkpoint_dir=ckpt)

    # interrupted run: epoch 0 only, checkpointed, then resumed to the end
    cfg2 = _tiny_cfg()
    cfg2.extras.update(synthetic_targets=8, synthetic_sources=6)
    cfg2.epochs = 2
    cfg2.save_epoch = 1
    ckpt2 = str(tmp_path / "ck2")
    steps_per_epoch = 8 // cfg2.batch_size
    train(cfg2, num_steps=steps_per_epoch, log_every=100,
          checkpoint_dir=ckpt2)
    cfg2.extras["resume"] = True
    resumed_state, _ = train(cfg2, log_every=100, checkpoint_dir=ckpt2)

    assert int(resumed_state.step) == int(full_state.step)
    a = np.asarray(
        resumed_state.params["target_encoder_full"]["fc"]["kernel"])
    b = np.asarray(full_state.params["target_encoder_full"]["fc"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_train_resume_from_mid_epoch_checkpoint(tmp_path):
    """A run interrupted MID-epoch (num_steps not a multiple of
    steps_per_epoch) leaves a final-step checkpoint; resume must continue
    from the exact optimizer step it covers — not round up to the next
    epoch boundary and silently skip the rest of that epoch."""
    cfg = _tiny_cfg()
    cfg.extras.update(synthetic_targets=8, synthetic_sources=6)
    cfg.epochs = 2   # 2 steps/epoch at bs=4 over 8 targets -> 4 steps total
    cfg.save_epoch = 1
    ckpt = str(tmp_path / "full")
    full_state, _ = train(cfg, log_every=100, checkpoint_dir=ckpt)
    assert int(full_state.step) == 4

    cfg2 = _tiny_cfg()
    cfg2.extras.update(synthetic_targets=8, synthetic_sources=6)
    cfg2.epochs = 2
    cfg2.save_epoch = 1
    ckpt2 = str(tmp_path / "resumed")
    # interrupt after 3 of 4 steps: one step into epoch 1
    train(cfg2, num_steps=3, log_every=100, checkpoint_dir=ckpt2)
    cfg2.extras["resume"] = True
    resumed_state, metrics = train(cfg2, log_every=100,
                                   checkpoint_dir=ckpt2)

    assert int(resumed_state.step) == int(full_state.step)
    assert metrics, "resumed run must actually run the remaining step"
    a = np.asarray(
        resumed_state.params["target_encoder_full"]["fc"]["kernel"])
    b = np.asarray(full_state.params["target_encoder_full"]["fc"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_zero_nonfinite_updates_filter():
    """The per-micro-step filter zeroes a poisoned gradient entirely and
    passes finite ones through untouched."""
    from ured_tpu.engine.train import _zero_nonfinite_updates

    tx = _zero_nonfinite_updates()
    state = tx.init(None)
    good = {"a": jnp.ones(3), "b": jnp.full((2,), 2.0)}
    out, state = tx.update(good, state)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones(3))
    bad = {"a": jnp.array([1.0, np.nan, 2.0]), "b": jnp.full((2,), 2.0)}
    out, state = tx.update(bad, state)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.zeros(3))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.zeros(2))
    inf_bad = {"a": jnp.array([1.0, np.inf, 2.0]), "b": jnp.zeros(2)}
    out, state = tx.update(inf_bad, state)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.zeros(3))


def test_grad_accumulation():
    """grad_accum_steps=2: params frozen after the first micro-step,
    updated after the second (optax.MultiSteps semantics), and the run
    stays finite."""
    cfg = _tiny_cfg()
    cfg.extras.update(synthetic_targets=8, synthetic_sources=6,
                      grad_accum_steps=2)
    from ured_tpu.data import synthetic
    from ured_tpu.engine.train import make_train_step

    data = synthetic.generate(num_targets=8, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    import jax

    batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(4), 8).items()}
    model = URED(cfg)
    tx, _ = make_optimizer(cfg, 1)
    state = init_state(cfg, model, tx, batch, seed=0)
    step = jax.jit(make_train_step(cfg, model, tx))
    p0 = np.asarray(state.params["target_encoder_full"]["fc"]["kernel"])
    state, m1 = step(state, batch, jnp.asarray(0))
    p1 = np.asarray(state.params["target_encoder_full"]["fc"]["kernel"])
    np.testing.assert_array_equal(p0, p1)   # accumulating, no update yet
    state, m2 = step(state, batch, jnp.asarray(0))
    p2 = np.asarray(state.params["target_encoder_full"]["fc"]["kernel"])
    assert not np.array_equal(p1, p2)       # k-th micro-step applies
    assert np.isfinite(float(m2["all_loss"]))


def test_train_on_partial_targets():
    cfg = _tiny_cfg()
    cfg.extras["synthetic_targets"] = 8
    cfg.extras["synthetic_sources"] = 6
    cfg.extras["train_on_partial"] = True
    state, metrics = train(cfg, num_steps=2, log_every=100)
    assert np.isfinite(float(metrics["all_loss"]))


def test_augment_default_recenters_and_bounds_rotation():
    """Default hot-loop augmentation parity (reference
    ``partnet_dataset.py:61-78``): batches come out recentered, and the
    random rotation is rigid and bounded by the 3x(+-10 deg) composition."""
    from ured_tpu.engine.train import make_augment_fn

    cfg = _tiny_cfg()
    assert cfg.random_rot  # reference config default
    aug = make_augment_fn(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64, 3)).astype(np.float32) + \
        np.array([5.0, -3.0, 2.0], np.float32)  # far off-center
    batch = {"x": jnp.asarray(x),
             "labels": jnp.asarray(rng.integers(0, 4, (4, 64))),
             "tgt_sem": jnp.asarray(rng.integers(0, 42, (4, 64)))}
    out = aug(batch, jax.random.PRNGKey(1))
    y = np.asarray(out["x"])

    # recentered (the rotation preserves the zero centroid)
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-4)
    # rigid: per-point norms match the centered input's
    xc = x - x.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(xc, axis=-1), rtol=1e-4)
    # bounded: X->Y->Z of +-10 deg each composes to < 18 deg total
    cos = np.sum(y * xc, axis=-1) / np.maximum(
        np.linalg.norm(y, axis=-1) * np.linalg.norm(xc, axis=-1), 1e-12)
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert ang.max() <= 18.0
    # rotation actually happened (not the identity)
    assert ang.max() > 0.1
    # labels/semantics untouched on the full-target path
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(batch["labels"]))


def test_augment_no_rot_flag_and_partial_mode():
    from ured_tpu.engine.train import make_augment_fn

    cfg = _tiny_cfg()
    cfg.random_rot = False
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 3)).astype(np.float32) + 1.0
    batch = {"x": jnp.asarray(x),
             "labels": jnp.asarray(rng.integers(0, 4, (2, 64))),
             "tgt_sem": jnp.asarray(rng.integers(0, 42, (2, 64)))}
    out = make_augment_fn(cfg)(batch, jax.random.PRNGKey(0))
    # no rotation: exactly the recentered input
    np.testing.assert_allclose(
        np.asarray(out["x"]), x - x.mean(axis=1, keepdims=True), atol=1e-5)

    # partial setting: occlusion mixture halves the point count and the
    # per-point annotations ride the same kept-index gather
    cfg.extras["train_on_partial"] = True
    out = make_augment_fn(cfg)(batch, jax.random.PRNGKey(0))
    assert out["x"].shape == (2, 32, 3)
    assert out["labels"].shape == (2, 32)
    assert out["tgt_sem"].shape == (2, 32)
    np.testing.assert_allclose(np.asarray(out["x"]).mean(axis=1), 0.0,
                               atol=1e-4)


def test_train_step_bf16_compute_dtype():
    """compute_dtype='bfloat16' (matmuls in bf16, params/stats f32) runs the
    full 7-loss step and keeps the loss finite — shape/numerics gate for the
    bf16 path that only gets timed on real hardware."""
    cfg = _tiny_cfg(compute_dtype="bfloat16")
    data = synthetic.generate(num_targets=4, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(4), 8).items()}
    tx, _ = make_optimizer(cfg, 1)
    state = init_state(cfg, model, tx, batch)
    step = jax.jit(make_train_step(cfg, model, tx))
    state, metrics = step(state, batch, jnp.asarray(0))
    assert np.isfinite(float(metrics["all_loss"]))
    # params stay f32
    k = state.params["target_encoder_full"]["fc"]["kernel"]
    assert k.dtype == jnp.float32


@pytest.mark.parametrize("category", ["table", "storage"])
def test_train_step_on_other_categories(category):
    """The synthetic corpus covers the reference's non-chair categories
    (config_train_table/display): parametric invariants hold and the full
    train step runs with finite decreasing loss."""
    cfg = _tiny_cfg()
    data = synthetic.generate(num_targets=4, num_sources=8, n_points=64,
                              points_per_part=16, max_parts=8, seed=0,
                              category=category)
    for s in range(8):
        rec = (data.src_mats[s] @ data.src_default[s]).reshape(-1, 3)
        np.testing.assert_allclose(rec, data.src_points[s], atol=1e-4)
    tx, _ = make_optimizer(cfg, 1)
    model = URED(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(4), 8).items()}
    state = init_state(cfg, model, tx, batch)
    step = jax.jit(make_train_step(cfg, model, tx))
    state, m0 = step(state, batch, jnp.asarray(0))
    for _ in range(6):
        state, m = step(state, batch, jnp.asarray(0))
    assert np.isfinite(float(m["all_loss"]))
    assert float(m["all_loss"]) < float(m0["all_loss"])


def test_auto_max_parts_shrinks_and_matches():
    """auto_max_parts truncates the padded part axis to the corpus maximum
    (6 synthetic chair parts of 16 slots).  The losses are mask-exact, but
    the graph decoder genuinely loses the always-padding constant nodes
    (the reference feeds all 16 slots into its attention unmasked,
    deformation_net.py:84-89), so the first-step loss is close, not
    bit-equal — this is a deliberate opt-in deviation."""
    from ured_tpu.engine.train import resolve_corpus

    cfg = _tiny_cfg(MAX_NUM_PARTS=16)
    cfg.extras.update(synthetic_targets=8, synthetic_sources=6)
    data = resolve_corpus(cfg)
    assert data.label_table.shape[1] == 16

    cfg2 = _tiny_cfg(MAX_NUM_PARTS=16)
    cfg2.extras.update(synthetic_targets=8, synthetic_sources=6,
                       auto_max_parts=True)
    data2 = resolve_corpus(cfg2)
    assert cfg2.MAX_NUM_PARTS == 6
    assert data2.label_table.shape[1] == 6

    def first_loss(c, d):
        tx, _ = make_optimizer(c, 1)
        model = URED(c)
        batch = {k: jnp.asarray(v) for k, v in d.make_batch(
            np.arange(4)).items()}
        state = init_state(c, model, tx, batch)
        step = jax.jit(make_train_step(c, model, tx))
        _, m = step(state, batch, jnp.asarray(0))
        return float(m["all_loss"])

    a = first_loss(cfg, data)
    b = first_loss(cfg2, data2)
    np.testing.assert_allclose(a, b, rtol=0.05)


def test_train_profile_dir_writes_trace(tmp_path):
    """profile_dir extra traces a window of steps into an xprof dump."""
    import os

    cfg = _tiny_cfg()
    cfg.extras.update(synthetic_targets=8, synthetic_sources=6,
                      profile_dir=str(tmp_path / "prof"),
                      profile_start=1, profile_steps=1)
    train(cfg, num_steps=3, log_every=100)
    dumped = []
    for root, _, files in os.walk(tmp_path / "prof"):
        dumped += files
    assert dumped, "no profiler artifacts written"
