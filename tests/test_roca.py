"""ROCA back-projection tests (synthetic pinhole geometry)."""

import numpy as np

from ured_tpu.data.roca import (
    ROCADataset,
    ROCADetection,
    backproject_depth,
    quaternion_to_matrix,
    to_object_frame,
)


def test_quaternion_identity_and_z90():
    np.testing.assert_allclose(
        quaternion_to_matrix(np.array([1.0, 0, 0, 0])), np.eye(3),
        atol=1e-12)
    r = quaternion_to_matrix(
        np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]))
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)


def test_backproject_roundtrip():
    # project known 3D points through a pinhole, then back-project
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    pts = np.array([[0.1, -0.05, 1.0], [0.2, 0.1, 2.0]])
    depth = np.zeros((48, 64))
    for p in pts:
        u = int(round(k[0, 0] * p[0] / p[2] + k[0, 2]))
        v = int(round(k[1, 1] * p[1] / p[2] + k[1, 2]))
        depth[v, u] = p[2]
    rec = backproject_depth(depth, k)
    assert rec.shape[0] == 2
    # allow pixel-quantization error
    d = np.linalg.norm(rec[:, None] - pts[None], axis=-1).min(0)
    assert d.max() < 0.05


def test_object_frame_inverse():
    rng = np.random.default_rng(0)
    p_obj = rng.normal(size=(10, 3))
    r = quaternion_to_matrix(np.array([0.9, 0.1, 0.2, 0.3]))
    t = np.array([0.5, -1.0, 2.0])
    s = np.array([2.0, 1.0, 0.5])
    p_cam = (p_obj * s) @ r.T + t
    back = to_object_frame(p_cam, r, t, s)
    np.testing.assert_allclose(back, p_obj, atol=1e-10)


def test_roca_dataset_fixed_shape():
    k = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    depth = np.ones((24, 32)) * 1.5
    mask = np.zeros((24, 32))
    mask[8:16, 10:20] = 1
    det = ROCADetection(depth=depth, mask=mask, intrinsics=k,
                        q=np.array([1.0, 0, 0, 0]), t=np.zeros(3))
    ds = ROCADataset([det], num_points=256)
    item = ds[0]
    assert item["x"].shape == (256, 3)
    # recentered
    np.testing.assert_allclose(item["x"].mean(0), 0.0, atol=1e-5)
