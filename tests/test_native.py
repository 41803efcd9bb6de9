"""Native C++ runtime tests: build + parity vs numpy."""

import numpy as np
import pytest

from ured_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib(auto_build=True)
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_nn_distance_matches_numpy(lib, rng):
    x = rng.normal(size=(100, 3)).astype(np.float32)
    y = rng.normal(size=(80, 3)).astype(np.float32)
    d1, i1, d2, i2 = native.nn_distance_native(x, y)
    d = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d1, d.min(1), rtol=1e-5)
    np.testing.assert_array_equal(i1, d.argmin(1))
    np.testing.assert_allclose(d2, d.min(0), rtol=1e-5)
    np.testing.assert_array_equal(i2, d.argmin(0))


def test_knn_table(lib, rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    k = 8
    table = native.knn_table_native(pts, k)
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :k]
    # first column is self
    np.testing.assert_array_equal(table[:, 0], np.arange(64))
    # distances of selected neighbors match the true k smallest
    got_d = np.take_along_axis(d, table, 1)
    want_d = np.take_along_axis(d, want, 1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)


def test_sample_surface(lib, rng):
    from ured_tpu.data.parametric import (
        aabbox_of_points,
        compute_param_linear_equation,
        get_default_param,
    )

    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                  for z in (0, 1)], np.float64)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    box = aabbox_of_points(v)
    va = compute_param_linear_equation(v, box)
    x0 = get_default_param(box)
    pts, pa = native.sample_surface_native(v, f, va, 256, seed=1)
    assert pts.shape == (256, 3)
    # A-rows are consistent: pa @ x0 reproduces the sampled points
    rec = (pa @ x0).reshape(-1, 3)
    np.testing.assert_allclose(rec, pts, atol=1e-9)
    # points on the box surface
    on_face = np.isclose(pts, 0.0, atol=1e-9) | np.isclose(pts, 1.0,
                                                           atol=1e-9)
    assert on_face.any(axis=1).all()


def test_min_pair_distance(lib):
    a = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    b = np.array([[3, 0, 0], [1.5, 0, 0]], np.float32)
    dist, joint = native.min_pair_distance_native(a, b)
    assert dist == pytest.approx(0.5)
    np.testing.assert_allclose(joint, [1.25, 0, 0], atol=1e-6)
