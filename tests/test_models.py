"""Model shape/behavior tests (replacing the reference's __main__ smoke
tests, SURVEY.md §4 item 2 — but asserted, not eyeballed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.models import (
    DeformNetMatching,
    GraphAttentionNet,
    MultiheadAttention,
    PointMLP,
    ResidualNet,
    STN3D,
    SrcEncoder,
    TargetEncoder,
    URED,
    softmax_attention,
)


def _init_apply(module, *args, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), *args, train=False, **kwargs)
    out, _ = module.apply(variables, *args, train=True, **kwargs,
                          mutable=["batch_stats"])
    return variables, out


def test_point_mlp_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    m = PointMLP([32, 64, 5], norm="batch")
    _, out = _init_apply(m, x)
    assert out.shape == (2, 16, 5)


@pytest.mark.parametrize("norm", ["none", "layer", "instance"])
def test_point_mlp_norms(rng, norm):
    x = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    m = PointMLP([32, 5], norm=norm)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 16, 5)


def test_softmax_attention_is_softmax(rng):
    q = jnp.asarray(rng.normal(size=(1, 2, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 6, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 6, 8)), jnp.float32)
    out, attn = softmax_attention(q, k, v)
    assert out.shape == (1, 2, 4, 8)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.parametrize("mech", ["softmax", "linear", "favor"])
def test_multihead_attention_mechanisms(rng, mech):
    x = jnp.asarray(rng.normal(size=(2, 10, 32)), jnp.float32)
    m = MultiheadAttention(embed_dim=32, num_heads=4, attention=mech)
    variables = m.init(jax.random.PRNGKey(0), x, x, x)
    out, _ = m.apply(variables, x, x, x)
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_graph_attention_net(rng):
    g = jnp.asarray(rng.normal(size=(2, 2, 64)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.float32)
    m = GraphAttentionNet(num_stages=2, embed_dim=64, num_heads=4)
    _, (g2, p2) = _init_apply(m, g, p)
    assert g2.shape == g.shape and p2.shape == p.shape


def test_target_encoder_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    sem = jnp.asarray(rng.normal(size=(2, 128, 16)), jnp.float32)
    enc = TargetEncoder(embedding_size=64, sem_size=16)
    _, (g, pp) = _init_apply(enc, x, sem)
    assert g.shape == (2, 64)
    assert pp.shape == (2, 128, 64)


def test_src_encoder_folds_parts(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 64, 3)), jnp.float32)
    sem = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    enc = TargetEncoder(embedding_size=32, is_src=True, sem_size=16)
    _, (g, pp) = _init_apply(enc, x, sem)
    assert g.shape == (2, 4, 32)
    assert pp.shape == (2, 4, 64, 32)


def test_target_encoder_no_sem(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    enc = TargetEncoder(embedding_size=32)
    _, (g, pp) = _init_apply(enc, x, None)
    assert g.shape == (2, 32)


def test_stn3d_identity_bias(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    m = STN3D()
    _, out = _init_apply(m, x)
    assert out.shape == (2, 3, 3)


def test_src_global_encoder(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    m = SrcEncoder(embedding_size=16)
    _, out = _init_apply(m, x)
    assert out.shape == (2, 16)


def test_deformnet_matching(rng):
    b, p, c = 2, 16, 32
    tgt = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(b, p, c)), jnp.float32)
    m = DeformNetMatching(input_dim=3 * c, graph_dim=c, max_num_parts=p)
    _, out = _init_apply(m, tgt, src)
    assert out.shape == (b, p, 6)


def test_masked_attention_padding_invariance(rng):
    """With mask_attention on, poisoning the padded part slots' content
    must not change the real parts' decoded params (the reference — and
    our default — lets padding nodes influence real ones through softmax
    attention and the global mean; masked attention plus a masked global
    mean is the opt-in `masked_attention` improvement)."""
    b, p, c = 2, 8, 16
    tgt = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(b, p, c)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 5 + [0] * 3, [1] * 6 + [0] * 2],
                                np.float32))
    m = DeformNetMatching(input_dim=3 * c, graph_dim=c, max_num_parts=p,
                          mask_attention=True)
    variables = m.init(jax.random.PRNGKey(0), tgt, src, train=False,
                       part_mask=mask)
    out1 = m.apply(variables, tgt, src, train=False, part_mask=mask)
    poisoned = src + 1e3 * (1.0 - mask)[..., None]
    out2 = m.apply(variables, tgt, poisoned, train=False, part_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out1) * np.asarray(mask)[..., None],
        np.asarray(out2) * np.asarray(mask)[..., None], atol=1e-4)

    # default (reference-parity) mode: padding DOES leak — guard that the
    # opt-in actually changes behavior
    m0 = DeformNetMatching(input_dim=3 * c, graph_dim=c, max_num_parts=p)
    v0 = m0.init(jax.random.PRNGKey(0), tgt, src, train=False,
                 part_mask=mask)
    a = m0.apply(v0, tgt, src, train=False, part_mask=mask)
    bb = m0.apply(v0, tgt, poisoned, train=False, part_mask=mask)
    assert not np.allclose(np.asarray(a) * np.asarray(mask)[..., None],
                           np.asarray(bb) * np.asarray(mask)[..., None],
                           atol=1e-4)


def test_residual_net(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 24)), jnp.float32)
    m = ResidualNet(input_dim=24)
    _, out = _init_apply(m, x)
    assert out.shape == (2, 64, 3)


def _tiny_cfg():
    return URedConfig(
        batch_size=2, MAX_NUM_PARTS=4, num_target_points=32,
        num_part_points=8, sem_latent_dim=8, source_latent_dim=16,
        target_latent_dim=16, part_latent_dim=16)


def _tiny_batch(rng, cfg):
    b, n, p, npp = cfg.batch_size, cfg.num_target_points, \
        cfg.MAX_NUM_PARTS, cfg.num_part_points
    return {
        "x": jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 3, size=(b, n))),
        "tgt_sem": jnp.asarray(rng.integers(0, 42, size=(b, n))),
        "src_points": jnp.asarray(rng.normal(size=(b, p, npp, 3)), jnp.float32),
        "src_sem": jnp.asarray(rng.integers(0, 42, size=(b, p))),
        "src_mat": jnp.asarray(rng.normal(size=(b, p, 3 * npp, 6)), jnp.float32),
        "src_valid": jnp.ones((b, p), jnp.float32),
    }


def test_ured_full_forward(rng):
    cfg = _tiny_cfg()
    batch = _tiny_batch(rng, cfg)
    model = URED(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    b, n, p, npp = cfg.batch_size, cfg.num_target_points, \
        cfg.MAX_NUM_PARTS, cfg.num_part_points
    assert out["params"].shape == (b, p, 6)
    assert out["deformed"].shape == (b, p, npp, 3)
    assert out["recon_full"].shape == (b, n, 3)
    assert out["recon_src"].shape == (b, p, npp, 3)
    assert out["re_residuals"].shape == (b, n, 3)
    assert out["part_f"].shape == (b, p, cfg.target_latent_dim)
    # parts 0..2 present, 3 absent
    np.testing.assert_allclose(np.asarray(out["part_mask"][:, 3]), 0.0)
    # checkpoint granularity: module names match the reference state_dict keys
    for name in ["target_encoder_full", "param_decoder_full",
                 "recon_decoder_full", "re_order_decoder_full",
                 "src_encoder_all", "recon_decoder_src", "embedding_layer"]:
        assert name in variables["params"], name
