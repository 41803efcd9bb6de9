"""Completion model tests (PCN / VRCNet / discriminator)."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.models.completion import PCN, PointDiscriminator, VRCNet


def test_pcn_shapes(rng):
    partial = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    m = PCN(num_coarse=64, grid_size=2)
    v = m.init(jax.random.PRNGKey(0), partial, train=False)
    coarse, fine = m.apply(v, partial, train=False)
    assert coarse.shape == (2, 64, 3)
    assert fine.shape == (2, 256, 3)
    assert np.isfinite(np.asarray(fine)).all()


def test_vrcnet_shapes(rng):
    partial = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    m = VRCNet(num_coarse=32, up_factor=4, latent_dim=64)
    v = m.init(jax.random.PRNGKey(0), partial, train=False)
    coarse, fine, kl = m.apply(v, partial, train=False)
    assert float(kl) == 0.0  # no gt -> prior path, no KL
    assert coarse.shape == (2, 32, 3)
    assert fine.shape == (2, 128, 3)
    # fine points stay near their coarse centers (bounded tanh offsets)
    center = np.repeat(np.asarray(coarse), 4, axis=1)
    assert np.abs(np.asarray(fine) - center).max() <= 0.1 + 1e-6


def test_discriminator(rng):
    pts = jnp.asarray(rng.normal(size=(4, 64, 3)), jnp.float32)
    m = PointDiscriminator()
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    score = m.apply(v, pts, train=False)
    assert score.shape == (4, 1)


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


def test_vrcnet_dual_path_kl(rng):
    import jax

    partial = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    m = VRCNet(num_coarse=16, up_factor=4, latent_dim=32, size_z=8)
    v = m.init({"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)}, partial, gt, train=True)
    coarse, fine, kl = m.apply(v, partial, gt, train=True,
                               rngs={"sample": jax.random.PRNGKey(2)})
    assert np.isfinite(float(kl)) and float(kl) >= 0
    # posterior/prior/generator parameter groups exist (vrcnet.py:419-422)
    for name in ("prior_infer", "posterior_infer1", "posterior_infer2",
                 "generator"):
        assert name in v["params"], name
