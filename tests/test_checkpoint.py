"""Checkpoint round-trip + group-selective restore (init_dm / init_re).

One flow (single setup + train step + save) covers both behaviors, keeping
the orbax/compile cost down.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.engine.train import init_state, make_optimizer
from ured_tpu.models.ured import URED
from ured_tpu.utils.checkpoint import (
    restore_checkpoint,
    restore_groups,
    save_checkpoint,
)


def test_roundtrip_and_group_restore(tmp_path):
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
    # Advance the state with one synthetic optimizer update (unit grads)
    # instead of a full jitted train step: the round-trip under test is the
    # checkpoint layer, which only sees the resulting pytree, and the real
    # step is covered by test_train.py.  Keeps this test off the suite's
    # slowest-compiles list.
    grads = jax.tree.map(jnp.ones_like, state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    import optax

    trained = state.replace(
        params=optax.apply_updates(state.params, updates),
        opt_state=new_opt)
    save_checkpoint(str(tmp_path / "ckpt"), trained, step=0)

    # full round-trip restores params AND optimizer state (the reference
    # dropped optimizer state, train.py:349-358)
    fresh = init_state(cfg, model, tx, batch, seed=123)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    np.testing.assert_array_equal(
        np.asarray(trained.params["target_encoder_full"]["fc"]["kernel"]),
        np.asarray(restored.params["target_encoder_full"]["fc"]["kernel"]))
    assert jax.tree.all(jax.tree.map(
        lambda x, y: bool(np.array_equal(np.asarray(x), np.asarray(y))),
        trained.opt_state, restored.opt_state))

    # group-selective restore: dm modules come from the checkpoint, the
    # re module keeps its fresh init (init_dm semantics, train.py:50-63)
    fresh2 = init_state(cfg, model, tx, batch, seed=999)
    dm_only = restore_groups(str(tmp_path / "ckpt"), fresh2, groups=("dm",))
    np.testing.assert_array_equal(
        np.asarray(trained.params["target_encoder_full"]["fc"]["kernel"]),
        np.asarray(dm_only.params["target_encoder_full"]["fc"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(fresh2.params["re_order_decoder_full"]["residual_net"]
                   ["Dense_0"]["kernel"]),
        np.asarray(dm_only.params["re_order_decoder_full"]["residual_net"]
                   ["Dense_0"]["kernel"]))


def test_restore_accepts_step_directory(tmp_path):
    """dm_model_path may name the concrete step dir, like the reference's
    .pth paths."""
    import jax.numpy as jnp

    from ured_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    state = {"w": jnp.arange(4, dtype=jnp.float32)}
    root = str(tmp_path / "checkpoints")
    save_checkpoint(root, state, step=7)
    out = restore_checkpoint(str(tmp_path / "checkpoints" / "7"),
                             {"w": jnp.zeros(4, jnp.float32)})
    assert np.allclose(np.asarray(out["w"]), np.arange(4))
