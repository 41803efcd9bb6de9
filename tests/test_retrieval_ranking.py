"""Legacy retrieval-ranking loss tests."""

import jax.numpy as jnp
import numpy as np

from ured_tpu.losses.retrieval_ranking import (
    retrieval_ranking_anchor_loss,
    retrieval_ranking_margin_loss,
    retrieval_regression_loss,
    retrieval_regression_loss2,
    retrieval_regression_loss3,
    retrieval_regression_loss4,
)


def _data(rng, k=5, b=3):
    pred = jnp.asarray(rng.uniform(0, 1, size=(k, b)), jnp.float32)
    actual = jnp.asarray(rng.uniform(0, 1, size=(k, b)), jnp.float32)
    return pred, actual


def test_regression_losses_shapes(rng):
    pred, actual = _data(rng)
    for fn in (retrieval_regression_loss, retrieval_regression_loss2):
        out = fn(pred, actual)
        assert out.shape == (3,)
        assert np.all(np.asarray(out) >= 0)
    for fn in (retrieval_regression_loss3, retrieval_regression_loss4):
        out = fn(pred.T, actual.T)   # [B, K] layout
        assert out.shape == (3,)


def test_distribution_loss_zero_at_match(rng):
    pred, _ = _data(rng)
    out = retrieval_regression_loss4(pred.T, pred.T)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_ranking_margin_prefers_consistent_order(rng):
    actual = jnp.asarray(np.linspace(0, 1, 5)[:, None].repeat(2, 1),
                         jnp.float32)
    good = actual  # predictions increase with true rank
    bad = 1.0 - actual
    lg = retrieval_ranking_margin_loss(good, actual)
    lb = retrieval_ranking_margin_loss(bad, actual)
    assert np.all(np.asarray(lg) < np.asarray(lb))


def test_anchor_loss_bounds(rng):
    actual = jnp.asarray(np.linspace(0, 1, 4)[:, None], jnp.float32)
    # perfect anchors: best candidate predicted 0, worst predicted 1
    pred = actual
    out = retrieval_ranking_anchor_loss(pred, actual)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
