"""Checkpoint round-trip + group-selective restore (init_dm / init_re)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.engine.train import init_state, make_optimizer, make_train_step
from ured_tpu.models.ured import URED
from ured_tpu.utils.checkpoint import (
    restore_checkpoint,
    restore_groups,
    save_checkpoint,
)


def _setup():
    cfg = URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=64,
                     num_part_points=16, sem_latent_dim=8,
                     source_latent_dim=16, target_latent_dim=16,
                     part_latent_dim=16)
    data = synthetic.generate(num_targets=2, num_sources=4, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(data, np.arange(2), 8).items()}
    tx, _ = make_optimizer(cfg, 1)
    model = URED(cfg)
    state = init_state(cfg, model, tx, batch)
    return cfg, model, tx, state, batch


def test_roundtrip(tmp_path):
    cfg, model, tx, state, batch = _setup()
    step = jax.jit(make_train_step(cfg, model, tx))
    state, _ = step(state, batch, jnp.asarray(0))
    save_checkpoint(str(tmp_path / "ckpt"), state, step=0)

    fresh = init_state(cfg, model, tx, batch, seed=123)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    a = np.asarray(state.params["target_encoder_full"]["fc"]["kernel"])
    b = np.asarray(restored.params["target_encoder_full"]["fc"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # optimizer state restored too (the reference dropped it)
    chex_equal = jax.tree.all(jax.tree.map(
        lambda x, y: bool(np.array_equal(np.asarray(x), np.asarray(y))),
        state.opt_state, restored.opt_state))
    assert chex_equal


def test_group_selective_restore(tmp_path):
    cfg, model, tx, state, batch = _setup()
    step = jax.jit(make_train_step(cfg, model, tx))
    trained, _ = step(state, batch, jnp.asarray(0))
    save_checkpoint(str(tmp_path / "ckpt"), trained, step=0)

    fresh = init_state(cfg, model, tx, batch, seed=999)
    dm_only = restore_groups(str(tmp_path / "ckpt"), fresh, groups=("dm",))

    # dm module came from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(trained.params["target_encoder_full"]["fc"]["kernel"]),
        np.asarray(dm_only.params["target_encoder_full"]["fc"]["kernel"]))
    # re module kept the fresh init
    np.testing.assert_array_equal(
        np.asarray(fresh.params["re_order_decoder_full"]["residual_net"]
                   ["Dense_0"]["kernel"]),
        np.asarray(dm_only.params["re_order_decoder_full"]["residual_net"]
                   ["Dense_0"]["kernel"]))
