"""Golden-value tests for the analytic deformation math (SURVEY.md §4:
"golden-value tests for get_shape deformation math")."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.ops import (
    compute_aabbox,
    gather_part_feature,
    get_shape,
    get_symmetric,
    group_points_by_part,
    part_aabb,
    part_segment_mean,
)
from ured_tpu.data.parametric import compute_param_linear_equation, get_default_param


def _axis_aligned_box(center, half):
    box = np.zeros(12)
    box[0:3] = center
    box[3:6] = 2.0 * np.asarray(half)
    box[6:9] = [1, 0, 0]
    box[9:12] = [0, 1, 0]
    return box


def test_A_matrix_roundtrip(rng):
    # A @ default_param must reproduce the original points
    # (reference run_preprocessing.py:118-160 invariant).
    pts = rng.uniform(-1, 1, size=(40, 3))
    center, half = np.array([0.3, -0.2, 0.5]), np.array([0.8, 0.5, 1.2])
    pts = pts * half + center
    box = _axis_aligned_box(center, half)
    A = compute_param_linear_equation(pts, box)
    x0 = get_default_param(box)
    rec = (A @ x0).reshape(-1, 3)
    np.testing.assert_allclose(rec, pts, atol=1e-10)


def test_get_shape_translation_and_scale(rng):
    pts = rng.uniform(-1, 1, size=(32, 3))
    center, half = np.zeros(3), np.ones(3)
    box = _axis_aligned_box(center, half)
    A = compute_param_linear_equation(pts, box)
    x0 = get_default_param(box)

    A_j = jnp.asarray(A, jnp.float32)[None, None]          # [1, 1, 96, 6]
    x0_j = jnp.asarray(x0, jnp.float32)[None, None]        # [1, 1, 6]

    # delta translation (1, 2, 3), alpha=1 -> pure shift
    delta = jnp.asarray([[[1.0, 2.0, 3.0, 0, 0, 0]]], jnp.float32)
    out = get_shape(A_j, delta, x0_j, alpha=1.0)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), pts + np.array([1, 2, 3]), atol=1e-5)

    # delta scale: s doubles -> points scale 2x about origin-centered box
    delta = jnp.asarray([[[0, 0, 0, 1.0, 1.0, 1.0]]], jnp.float32)
    out = get_shape(A_j, delta, x0_j, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 2.0 * pts, atol=1e-5)

    # alpha scales the delta
    out = get_shape(A_j, delta, x0_j, alpha=0.5)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 1.5 * pts, atol=1e-5)


def test_get_shape_connectivity_projection(rng):
    pts = rng.uniform(-1, 1, size=(8, 3))
    box = _axis_aligned_box(np.zeros(3), np.ones(3))
    A = jnp.asarray(compute_param_linear_equation(pts, box), jnp.float32)[None, None]
    x0 = jnp.asarray(get_default_param(box), jnp.float32)[None, None]
    delta = jnp.asarray(rng.normal(size=(1, 1, 6)), jnp.float32)
    eye = jnp.eye(6)[None, None]
    out_proj = get_shape(A, delta, x0, alpha=0.3, connectivity=eye)
    out = get_shape(A, delta, x0, alpha=0.3)
    np.testing.assert_allclose(out_proj, out, atol=1e-6)


def test_get_symmetric():
    pc = jnp.asarray([[[1.0, 2.0, 3.0]]])
    np.testing.assert_allclose(get_symmetric(pc), [[[-1.0, 2.0, 3.0]]])


def test_compute_aabbox_masked(rng):
    pts = jnp.asarray(rng.uniform(-2, 3, size=(50, 3)), jnp.float32)
    box = compute_aabbox(pts)
    mn, mx = np.min(np.asarray(pts), 0), np.max(np.asarray(pts), 0)
    np.testing.assert_allclose(box[:3], (mn + mx) / 2, atol=1e-6)
    np.testing.assert_allclose(box[3:], (mx - mn) / 2, atol=1e-6)
    # mask excludes the second half of the points
    mask = jnp.asarray(np.arange(50) < 25, jnp.float32)
    box_m = compute_aabbox(pts, mask)
    np.testing.assert_allclose(box_m, compute_aabbox(pts[:25]), atol=1e-6)


def test_part_segment_mean_matches_loop(rng):
    b, n, c, p = 2, 40, 8, 4
    f = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=(b, n)))  # part 3 empty
    mean, mask, counts = part_segment_mean(f, labels, p)
    for bi in range(b):
        for pi in range(p):
            sel = np.asarray(labels[bi]) == pi
            if sel.sum() == 0:
                assert mask[bi, pi] == 0
            else:
                np.testing.assert_allclose(
                    mean[bi, pi], np.asarray(f[bi])[sel].mean(0), atol=1e-5)
                assert mask[bi, pi] == 1
    assert np.all(np.asarray(counts).sum(-1) == n)


def test_part_aabb_matches_loop(rng):
    b, n, p = 2, 60, 5
    pts = jnp.asarray(rng.uniform(-1, 1, size=(b, n, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(b, n)))
    boxes = part_aabb(pts, labels, p)
    for bi in range(b):
        for pi in range(4):
            sel = np.asarray(labels[bi]) == pi
            if sel.sum():
                want = compute_aabbox(pts[bi][sel])
                np.testing.assert_allclose(boxes[bi, pi], want, atol=1e-5)
    np.testing.assert_allclose(boxes[:, 4], 0.0, atol=1e-6)


def test_gather_part_feature(rng):
    part_f = jnp.asarray(rng.normal(size=(1, 3, 4)), jnp.float32)
    labels = jnp.asarray([[0, 2, 1, 2]])
    out = gather_part_feature(part_f, labels)
    np.testing.assert_allclose(out[0, 1], part_f[0, 2])
    np.testing.assert_allclose(out[0, 3], part_f[0, 2])


def test_group_points_by_part(rng):
    b, n, p, npp = 1, 24, 4, 8
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    # deterministic labels: parts of size 8, 10, 6 (part 1 overflows npp=8)
    labels_np = np.array([0] * 8 + [1] * 10 + [2] * 6)
    labels = jnp.asarray(labels_np[None])
    grouped, valid = group_points_by_part(pts, labels, p, npp)
    assert grouped.shape == (b, p, npp, 3)

    # exact-fit part: points preserved in order of appearance
    np.testing.assert_allclose(
        np.asarray(grouped[0, 0]), np.asarray(pts[0, :8]), atol=1e-6)
    assert int(valid[0, 0].sum()) == 8

    # overflowing part: first npp-1 points kept, overflow collapses into the
    # last slot (fixed-shape policy; the reference keeps ragged lists)
    np.testing.assert_allclose(
        np.asarray(grouped[0, 1, :7]), np.asarray(pts[0, 8:15]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grouped[0, 1, 7]), np.asarray(pts[0, 17]), atol=1e-6)
    assert int(valid[0, 1].sum()) == 8

    # under-full part: valid count matches, padding repeats the first point
    sel = np.asarray(grouped[0, 2])
    np.testing.assert_allclose(sel[:6], np.asarray(pts[0, 18:24]), atol=1e-6)
    np.testing.assert_allclose(sel[6:], np.broadcast_to(sel[0], (2, 3)),
                               atol=1e-6)
    assert int(valid[0, 2].sum()) == 6

    # absent part: fully invalid
    assert int(valid[0, 3].sum()) == 0


def test_icp_forward_and_param_init(rng):
    from ured_tpu.ops.deform import get_param_init, icp_forward

    pts = rng.uniform(-1, 1, size=(16, 3))
    box = _axis_aligned_box(np.zeros(3), np.ones(3))
    A = jnp.asarray(compute_param_linear_equation(pts, box), jnp.float32)[None, None]
    x0 = jnp.asarray(get_default_param(box), jnp.float32)[None, None]
    delta = jnp.asarray(rng.normal(size=(1, 1, 6)) * 0.1, jnp.float32)
    # absolute-params forward == delta forward with default folded in
    p_abs = get_param_init(delta, x0, alpha=0.1)
    from ured_tpu.ops.deform import get_shape
    np.testing.assert_allclose(
        np.asarray(icp_forward(A, p_abs)),
        np.asarray(get_shape(A, delta, x0, alpha=0.1)), atol=1e-5)


def test_fit_params_icp_recovers_transform(rng):
    from ured_tpu.ops.deform import fit_params_icp, get_param_init, icp_forward

    pts = rng.uniform(-1, 1, size=(64, 3))
    box = _axis_aligned_box(np.zeros(3), np.ones(3))
    A = jnp.asarray(compute_param_linear_equation(pts, box),
                    jnp.float32)[None, None]
    x0 = jnp.asarray(get_default_param(box), jnp.float32)[None, None]
    # ground-truth deformation: translate + anisotropic scale
    true_p = x0 + jnp.asarray([[[0.3, -0.2, 0.1, 0.4, -0.1, 0.2]]],
                              jnp.float32)
    target = icp_forward(A, true_p).reshape(1, -1, 3)
    # start from the rest pose; ICP should recover the true params
    fitted = fit_params_icp(A, x0, target, iters=12)
    np.testing.assert_allclose(np.asarray(fitted), np.asarray(true_p),
                               atol=2e-2)
    # post-fit chamfer is tiny
    from ured_tpu.ops import chamfer_distance
    cd = chamfer_distance(icp_forward(A, fitted).reshape(1, -1, 3), target)
    assert float(cd[0]) < 1e-3
