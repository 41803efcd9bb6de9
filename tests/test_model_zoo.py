"""Model-zoo tests: VN equivariance/invariance, GCN3D, PointNet/PointNet++,
legacy nets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.models.gcn3d import GCN3DEncoder
from ured_tpu.models.legacy import (
    DeformNetDesign1,
    DeformNetDesign2,
    MLPPositionalEncoding,
    ReNetwork,
)
from ured_tpu.models.pointnet import (
    FeaturePropagation,
    PointNet2ClsMSG,
    PointNet2ClsSSG,
    PointNet2SegSSG,
    PointNetCls,
    PointNetSeg,
    feature_transform_regularizer,
)
from ured_tpu.models.vn import (
    VNEncoder,
    VNLeakyReLU,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
)


def _rot(rng):
    from scipy.spatial.transform import Rotation

    return jnp.asarray(
        Rotation.random(random_state=int(rng.integers(1 << 16)))
        .as_matrix(), jnp.float32)


def _apply_rot(x, r):
    return jnp.einsum("...v,wv->...w", x, r)


def test_vn_linear_equivariance(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 3)), jnp.float32)
    r = _rot(rng)
    m = VNLinear(6)
    v = m.init(jax.random.PRNGKey(0), x)
    out_rot = m.apply(v, _apply_rot(x, r))
    rot_out = _apply_rot(m.apply(v, x), r)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(rot_out),
                               atol=1e-5)


def test_vn_leakyrelu_equivariance(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 3)), jnp.float32)
    r = _rot(rng)
    m = VNLeakyReLU()
    v = m.init(jax.random.PRNGKey(0), x)
    out_rot = m.apply(v, _apply_rot(x, r))
    rot_out = _apply_rot(m.apply(v, x), r)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(rot_out),
                               atol=1e-4)


def test_vn_block_and_maxpool_equivariance(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 3)), jnp.float32)
    r = _rot(rng)
    m = VNLinearLeakyReLU(6, use_batchnorm=False)
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m.apply(v, _apply_rot(x, r))),
        np.asarray(_apply_rot(m.apply(v, x), r)), atol=1e-4)

    mp = VNMaxPool()
    vp = mp.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(mp.apply(vp, _apply_rot(x, r))),
        np.asarray(_apply_rot(mp.apply(vp, x), r)), atol=1e-4)


def test_vn_std_feature_invariance(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    r = _rot(rng)
    m = VNStdFeature(use_batchnorm=False)
    v = m.init(jax.random.PRNGKey(0), x)
    inv1, _ = m.apply(v, x)
    inv2, _ = m.apply(v, _apply_rot(x, r))
    np.testing.assert_allclose(np.asarray(inv1), np.asarray(inv2), atol=1e-4)


@pytest.mark.slow  # train-mode VN-DGCNN compile ~20 s on the 1-core CI box;
# eval-mode init+apply shape coverage stays fast in
# test_vn_encoder_from_config_honors_pooling_keys
def test_vn_encoder_shapes(rng):
    pts = jnp.asarray(rng.normal(size=(1, 32, 3)), jnp.float32)
    m = VNEncoder(embedding_size=16, k=6)
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    (g, pp), _ = m.apply(v, pts, train=True, mutable=["batch_stats"])
    assert g.shape == (1, 16)
    assert pp.shape == (1, 32, 16)


def test_vn_neighbor_maxpool_equivariance(rng):
    # neighbor-axis pool: [B, N, k, C, 3] -> [B, N, C, 3]
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 4, 3)), jnp.float32)
    r = _rot(rng)
    mp = VNMaxPool(axis=2)
    vp = mp.init(jax.random.PRNGKey(0), x)
    out = mp.apply(vp, x)
    assert out.shape == (2, 5, 4, 3)
    np.testing.assert_allclose(
        np.asarray(mp.apply(vp, _apply_rot(x, r))),
        np.asarray(_apply_rot(out, r)), atol=1e-4)


@pytest.mark.slow  # 1-core lane budget: whole-encoder compile; VN layer equivariance property tests stay fast
def test_vn_encoder_from_config_honors_pooling_keys(rng):
    from ured_tpu.config import URedConfig

    cfg = URedConfig(target_latent_dim=16, n_knn=6, pooling="max")
    m = VNEncoder.from_config(cfg)
    assert (m.k, m.pooling, m.embedding_size) == (6, "max", 16)
    pts = jnp.asarray(rng.normal(size=(1, 32, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    # pooling='max' instantiates learned-direction neighbor pools
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    assert any("VNMaxPool" in jax.tree_util.keystr(p) for p, _ in flat)
    g, pp = m.apply(v, pts, train=False)
    assert g.shape == (1, 16) and pp.shape == (1, 32, 16)


def test_gcn3d_conv_layer_matches_numpy_oracle(rng):
    """ConvLayer reduction order pinned to the reference math
    (P_3DGC.py:Conv_layer:140-163): relu-cosine gate per
    (support, out-channel) direction, max over neighbors, THEN sum over
    supports, plus the center linear path with the bias applied before the
    center/support split."""
    from ured_tpu.models.gcn3d import ConvLayer, knn_indices

    b, n, k, cin, cout, s = 2, 10, 3, 5, 4, 3
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    idx = knn_indices(pts, k)
    m = ConvLayer(cout, s)
    v = m.init(jax.random.PRNGKey(0), pts, feat, idx)
    out = np.asarray(m.apply(v, pts, feat, idx))

    w = np.asarray(v["params"]["weights"])          # [cin, (s+1)*cout]
    bias = np.asarray(v["params"]["bias"])          # [(s+1)*cout]
    dirs = np.asarray(v["params"]["directions"])    # [3, s*cout]
    dirs = dirs / (np.linalg.norm(dirs, axis=0, keepdims=True) + 1e-8)
    pts_n, feat_n, idx_n = map(np.asarray, (pts, feat, idx))

    ref = np.zeros((b, n, cout), np.float32)
    for bi in range(b):
        fo = feat_n[bi] @ w + bias                  # [n, (s+1)*cout]
        center, support = fo[:, :cout], fo[:, cout:]
        for ni in range(n):
            acc = np.zeros((k, s * cout), np.float32)
            for kk in range(k):
                nb = idx_n[bi, ni, kk]
                d = pts_n[bi, nb] - pts_n[bi, ni]
                d = d / (np.linalg.norm(d) + 1e-8)
                theta = np.maximum(d @ dirs, 0.0)   # [s*cout]
                acc[kk] = theta * support[nb]
            gated = acc.reshape(k, s, cout).max(axis=0).sum(axis=0)
            ref[bi, ni] = center[ni] + gated
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # 5-scale encoder compile ~16 s; ConvLayer math is oracle-
# tested fast above
def test_gcn3d_encoder(rng):
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    m = GCN3DEncoder(global_dim=32, per_point_dim=16, neighbor_num=8)
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    g, pp = m.apply(v, pts, train=False)
    assert g.shape == (2, 32)
    assert pp.shape == (2, 64, 16)
    assert np.isfinite(np.asarray(g)).all()


def test_pointnet_cls_seg(rng):
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    m = PointNetCls(num_classes=10)
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    logp, trans_feat = m.apply(v, pts, train=False)
    assert logp.shape == (2, 10)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               rtol=1e-4)
    assert float(feature_transform_regularizer(trans_feat)) >= 0

    s = PointNetSeg(num_classes=5)
    vs = s.init(jax.random.PRNGKey(0), pts, train=False)
    logp, _ = s.apply(vs, pts, train=False)
    assert logp.shape == (2, 64, 5)


@pytest.mark.parametrize("cls", [
    PointNet2ClsSSG,
    # MSG compiles 3 grouping scales per level (~22 s on the 1-core CI
    # box); the shared SA machinery is covered by SSG in the fast lane
    pytest.param(PointNet2ClsMSG, marks=pytest.mark.slow),
])
def test_pointnet2_cls(rng, cls):
    pts = jnp.asarray(rng.normal(size=(2, 512, 3)), jnp.float32)
    m = cls(num_classes=7)
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    logp = m.apply(v, pts, train=False)
    assert logp.shape == (2, 7)
    assert np.isfinite(np.asarray(logp)).all()


@pytest.mark.slow  # 1-core lane budget: zoo variant compile; PointNet2ClsSSG + pointnet_cls_seg stay the fast zoo representatives
def test_pointnet2_seg(rng):
    pts = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    m = PointNet2SegSSG(num_classes=6)
    v = m.init(jax.random.PRNGKey(0), pts, train=False)
    logp = m.apply(v, pts, train=False)
    assert logp.shape == (2, 256, 6)


@pytest.mark.slow  # VN-encoder-inside compile ~14 s; VN primitives and the
# order-MLP contract are covered fast
def test_re_network(rng):
    src = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    m = ReNetwork(latent_dim=32, k_neighbors=8)
    v = m.init(jax.random.PRNGKey(0), src, tgt, train=False)
    score, _ = m.apply(v, src, tgt, train=True, mutable=["batch_stats"])
    assert score.shape == (2, 1)
    assert (np.asarray(score) > 0).all() and (np.asarray(score) < 1).all()


def test_legacy_deform_designs(rng):
    b, p, c = 2, 6, 16
    g = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    parts = jnp.asarray(rng.normal(size=(b, p, c)), jnp.float32)
    for cls in (DeformNetDesign1, DeformNetDesign2):
        m = cls()
        v = m.init(jax.random.PRNGKey(0), g, t, parts, train=False)
        out = m.apply(v, g, t, parts, train=False)
        assert out.shape == (b, p, 6)


def test_positional_encoding(rng):
    kpts = jnp.asarray(rng.normal(size=(2, 10, 2)), jnp.float32)
    side = jnp.asarray(rng.normal(size=(2, 10, 3)), jnp.float32)
    m = MLPPositionalEncoding(embed_dim=16)
    v = m.init(jax.random.PRNGKey(0), kpts, side)
    out = m.apply(v, kpts, side)
    assert out.shape == (2, 10, 16)


@pytest.mark.slow  # 1-core lane budget: zoo variant compile; PointNet2ClsSSG + pointnet_cls_seg stay the fast zoo representatives
def test_pointnet2_part_seg_variants(rng):
    from ured_tpu.models.pointnet import PointNet2PartSeg

    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    cls_label = jnp.asarray([3, 7], jnp.int32)
    for msg in (False, True):
        model = PointNet2PartSeg(num_part_classes=10, msg=msg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, xyz, cls_label, train=False)
        out = model.apply(variables, xyz, cls_label, train=False)
        assert out.shape == (2, 128, 10)
        # log-probs normalize
        np.testing.assert_allclose(
            np.asarray(jnp.exp(out).sum(-1)), 1.0, atol=1e-4)
