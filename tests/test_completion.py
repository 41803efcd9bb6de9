"""Completion model tests (PCN / VRCNet / discriminator)."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.models.completion import PCN, PointDiscriminator, VRCNet
import pytest


def test_pcn_shapes(rng):
    partial = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    m = PCN(num_coarse=64, grid_size=2)
    v = m.init(jax.random.PRNGKey(0), partial, train=False)
    coarse, fine = m.apply(v, partial, train=False)
    assert coarse.shape == (2, 64, 3)
    assert fine.shape == (2, 256, 3)
    assert np.isfinite(np.asarray(fine)).all()


def _tiny_vrcnet():
    return VRCNet(num_fine=128, num_coarse=32, num_fps=64,
                  num_coarse_raw=64, latent_dim=64, size_z=16,
                  init_channel=8, bottleneck=64, knn_list=(4, 8), pk=4,
                  layers=(1, 1, 1, 1))


@pytest.mark.slow
def test_vrcnet_msap_skn_stages(rng):
    """The MSAP_SKN decoder's four stages (ref vrcnet.py:293-402):
    coarse_raw FC skeleton, coarse_high relational U-Net output, guided
    downsampling to coarse, local-folding upsampling to fine."""
    partial = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    m = _tiny_vrcnet()
    v = m.init(jax.random.PRNGKey(0), partial, train=False)
    outs, kl = m.apply(v, partial, train=False)
    assert float(kl) == 0.0  # no gt -> no distribution losses
    assert outs["coarse_raw"].shape == (2, 64, 3)
    assert outs["coarse_high"].shape == (2, 128, 3)   # 64 raw + 64 input
    assert outs["coarse"].shape == (2, 32, 3)
    assert outs["fine"].shape == (2, 128, 3)
    assert np.isfinite(np.asarray(outs["fine"])).all()
    # guided downsampling selects a SUBSET of coarse_high points (FPS then
    # learned-score top-k are both gathers, ref vrcnet.py:373-388)
    high = np.asarray(outs["coarse_high"])
    coarse = np.asarray(outs["coarse"])
    for b in range(2):
        d = np.linalg.norm(coarse[b][:, None] - high[b][None], axis=-1)
        assert d.min(axis=1).max() < 1e-5


def test_discriminator(rng):
    pts = jnp.asarray(rng.normal(size=(4, 64, 3)), jnp.float32)
    m = PointDiscriminator()
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    score = m.apply(v, pts, train=False)
    assert score.shape == (4, 1)


@pytest.mark.slow
def test_pcn_trains(rng):
    import optax

    partial = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    m = PCN(num_coarse=16, grid_size=2)
    v = m.init(jax.random.PRNGKey(0), partial, train=False)
    from ured_tpu.ops import chamfer_distance

    def loss_fn(params):
        coarse, fine = m.apply({"params": params}, partial, train=True)
        return jnp.mean(chamfer_distance(fine, gt)) + \
            jnp.mean(chamfer_distance(coarse, gt))

    tx = optax.adam(1e-3)
    params = v["params"]
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(5):
        g = jax.grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0


@pytest.mark.slow
def test_vrcnet_dual_path_kl(rng):
    import jax

    partial = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    m = _tiny_vrcnet()
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    v = m.init(rngs, partial, gt, train=True)
    outs, kl = m.apply(v, partial, gt, train=True,
                       rngs={"sample": jax.random.PRNGKey(3),
                             "dropout": jax.random.PRNGKey(4)})
    assert np.isfinite(float(kl)) and float(kl) >= 0
    # both latent paths decode: doubled batch (ref vrcnet.py:461-466)
    assert outs["fine"].shape == (4, 128, 3)
    # posterior/prior/generator parameter groups exist (vrcnet.py:419-422)
    for name in ("prior_infer", "posterior_infer1", "posterior_infer2",
                 "generator"):
        assert name in v["params"], name


@pytest.mark.slow
def test_vrcnet_loss_decreases_in_harness(rng):
    """Multi-stage loss decrease through the completion harness (the
    VERDICT-required shape/loss-decrease check)."""
    import optax

    from ured_tpu.engine.completion import (
        CompletionState,
        apply_completion,
        completion_loss,
        make_completion_step,
    )

    partial = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    m = VRCNet(num_fine=64, num_coarse=16, num_fps=32, num_coarse_raw=32,
               latent_dim=32, size_z=8, init_channel=8, bottleneck=32,
               knn_list=(4,), pk=4, layers=(1, 1, 1, 1))
    v = m.init({"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}, partial, gt, train=True)
    tx = optax.adam(1e-3)
    state = CompletionState(jnp.zeros((), jnp.int32), v["params"],
                            tx.init(v["params"]))
    step = jax.jit(make_completion_step(m, tx))

    def eval_loss(params):
        outs, kl = apply_completion(m, params, partial, gt, train=True,
                                    rng=jax.random.PRNGKey(9))
        return float(completion_loss(outs, gt, alpha=1.0, kl=kl))

    l0 = eval_loss(state.params)
    for _ in range(8):
        state, loss = step(state, partial, gt, 1.0)
    assert eval_loss(state.params) < l0
