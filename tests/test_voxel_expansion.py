"""Gridding / cubic-sampling / expansion-penalty tests vs exact oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.ops.expansion import (
    _mst_edge_lengths,
    expansion_penalty,
    mst_total_length_reference,
)
from ured_tpu.ops.voxel import (
    cubic_feature_sampling,
    gridding,
    gridding_reverse,
)


def test_gridding_mass_conservation(rng):
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(2, 64, 3)), jnp.float32)
    grid = gridding(pts, scale=16)
    assert grid.shape == (2, 16, 16, 16)
    # trilinear weights sum to 1 per point -> total mass == N
    np.testing.assert_allclose(np.asarray(grid.sum((1, 2, 3))), 64.0,
                               rtol=1e-4)


def test_gridding_exact_vertex():
    # a point exactly on a grid vertex puts all mass there
    scale = 5
    coords = -1.0 + 2.0 * np.arange(scale) / (scale - 1)
    p = jnp.asarray([[[coords[1], coords[2], coords[3]]]], jnp.float32)
    grid = gridding(p, scale=scale)
    assert np.asarray(grid[0, 1, 2, 3]) == pytest.approx(1.0, abs=1e-5)
    assert np.asarray(grid).sum() == pytest.approx(1.0, abs=1e-5)


def test_gridding_differentiable(rng):
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 16, 3)), jnp.float32)

    def loss(p):
        return jnp.sum(gridding(p, scale=8) ** 2)

    g = jax.grad(loss)(pts)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_gridding_reverse_recovers_cluster():
    # all mass in one cell -> reverse yields a point inside that cell
    scale = 8
    pts = jnp.asarray([[[0.05, 0.05, 0.05]] * 4], jnp.float32)
    grid = gridding(pts, scale=scale)
    rec = gridding_reverse(grid, scale=scale)
    nz = np.asarray(rec[0])
    nz = nz[np.abs(nz).sum(-1) > 0]
    assert len(nz) >= 1
    assert np.linalg.norm(nz - np.array([0.05, 0.05, 0.05]),
                          axis=-1).min() < 2.0 / (scale - 1)


def test_cubic_feature_sampling(rng):
    scale = 4
    feats = jnp.asarray(rng.normal(size=(1, scale ** 3, 5)), jnp.float32)
    coords = -1.0 + 2.0 * np.arange(scale) / (scale - 1)
    # point on vertex (1,1,1): all 8 gathered features include that vertex's
    p = jnp.asarray([[[coords[1] + 0.01, coords[1] + 0.01,
                       coords[1] + 0.01]]], jnp.float32)
    out = cubic_feature_sampling(p, feats, scale=scale)
    assert out.shape == (1, 1, 8, 5)
    vid = (1 * scale + 1) * scale + 1
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               np.asarray(feats[0, vid]), atol=1e-6)


def test_mst_matches_scipy(rng):
    for trial in range(3):
        pts = rng.normal(size=(24, 3)).astype(np.float32)
        per_point, total = _mst_edge_lengths(jnp.asarray(pts))
        want = mst_total_length_reference(pts)
        np.testing.assert_allclose(float(total), want, rtol=1e-3)
        # credited lengths are nonnegative and sum to the total
        pp = np.asarray(per_point)
        assert (pp >= 0).all()
        np.testing.assert_allclose(pp.sum(), float(total), rtol=1e-5)


def test_expansion_penalty_flags_outliers(rng):
    # tight cluster + one far point: the long edge dominates the penalty
    base = rng.normal(size=(15, 3)).astype(np.float32) * 0.01
    far = np.array([[5.0, 0, 0]], np.float32)
    pts = jnp.asarray(np.concatenate([base, far])[None])
    dist, loss, mean_mst = expansion_penalty(pts, primitive_size=16,
                                             alpha=1.5)
    assert float(loss) > 1.0          # the 5-unit edge is penalized
    assert int((np.asarray(dist) > 1.0).sum()) == 1

    # uniform tight cluster: no edge exceeds 1.5x the mean -> ~0 penalty
    tight = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32) * 0.01)
    _, loss2, _ = expansion_penalty(tight, primitive_size=16, alpha=3.0)
    assert float(loss2) < 1e-4
