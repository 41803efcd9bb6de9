"""kNN op tests against brute-force numpy."""

import jax.numpy as jnp
import numpy as np

from ured_tpu.ops import knn_graph, knn_points


def test_knn_points_matches_numpy(rng):
    p1 = rng.normal(size=(2, 20, 3)).astype(np.float32)
    p2 = rng.normal(size=(2, 30, 3)).astype(np.float32)
    res = knn_points(jnp.asarray(p1), jnp.asarray(p2), K=4, return_nn=True)
    for b in range(2):
        d = np.sum((p1[b][:, None] - p2[b][None]) ** 2, -1)
        order = np.argsort(d, axis=1)[:, :4]
        np.testing.assert_array_equal(np.asarray(res.idx[b]), order)
        np.testing.assert_allclose(
            np.asarray(res.dists[b]), np.take_along_axis(d, order, 1), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(res.knn[b]), p2[b][order], atol=1e-6)


def test_knn_points_masked(rng):
    p1 = rng.normal(size=(1, 8, 3)).astype(np.float32)
    p2 = rng.normal(size=(1, 16, 3)).astype(np.float32)
    mask = np.zeros((1, 16), np.float32)
    mask[:, :10] = 1
    res = knn_points(jnp.asarray(p1), jnp.asarray(p2), K=3,
                     p2_mask=jnp.asarray(mask))
    assert np.all(np.asarray(res.idx) < 10)


def test_knn_graph_self_first(rng):
    x = rng.normal(size=(1, 12, 3)).astype(np.float32)
    idx = knn_graph(jnp.asarray(x), k=3)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(12))
