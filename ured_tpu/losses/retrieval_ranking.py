"""Legacy retrieval-ranking regression losses.

Capability port of the unused-but-defined ranking family in reference
``loss/basic_loss.py:34-246`` — losses that teach a predicted retrieval
distance (``pred_dis``) to reproduce ground-truth distances
(``actual_dis``), via distribution matching, direct regression, and
rank-margin objectives.  All are pure jnp; the reference's masked in-place
ops and per-rank python loops become where/one-hot algebra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def retrieval_regression_loss(pred_dis: Array, actual_dis: Array) -> Array:
    """Softmax-distribution L1 + scaled direct regression
    (ref ``basic_loss.py:34-48``).  pred/actual: [K, B] -> [B]."""
    pred = pred_dis / 10.0
    qij = jax.nn.softmax(-pred, axis=0)
    pij = jax.nn.softmax(-actual_dis, axis=0)
    loss = jnp.sum(jnp.abs(pij - qij), axis=0)
    loss2 = jnp.sum(jnp.abs(pred - actual_dis), axis=0)
    return loss + 0.05 * loss2


def retrieval_regression_loss2(pred_dis: Array, actual_dis: Array) -> Array:
    """Plain L1 regression of scaled distances (ref ``:51-58``)."""
    return jnp.sum(jnp.abs(pred_dis / 10.0 - actual_dis), axis=0)


def retrieval_regression_loss3(pred_dis: Array, actual_dis: Array) -> Array:
    """L1 against clipped matching-aware distances (ref ``:61-67``).
    pred/actual: [B, K] -> [B]."""
    actual = jnp.minimum(actual_dis, 0.99)
    return jnp.sum(jnp.abs(pred_dis - actual), axis=1)


def retrieval_regression_loss4(pred_dis: Array, actual_dis: Array) -> Array:
    """Softmax-distribution L1 over candidates (ref ``:71-75``).
    pred/actual: [B, K] -> [B]."""
    qij = jax.nn.softmax(pred_dis, axis=1)
    pij = jax.nn.softmax(actual_dis, axis=1)
    return jnp.sum(jnp.abs(qij - pij), axis=1)


def _ranks(actual_dis: Array) -> Array:
    """Rank of each candidate per column (0 = closest).  [K, B] -> [K, B]."""
    idx = jnp.argsort(actual_dis, axis=0)
    return jnp.argsort(idx, axis=0)


def retrieval_ranking_margin_loss(pred_dis: Array,
                                  actual_dis: Array) -> Array:
    """Rank-consistency margin loss (ref ``retrieval_regression_loss5:
    78-104``): the prediction at true rank i should not exceed the
    prediction at rank i+1; boundary terms anchor rank 0 low and rank K-1
    near 1.  pred/actual: [K, B] -> [B]."""
    k = pred_dis.shape[0]
    order = _ranks(actual_dis)                        # [K, B]
    # value of the prediction at each true rank: scatter via one-hot
    onehot = jax.nn.one_hot(order, k, axis=0)          # [rank, K, B]
    by_rank = jnp.einsum("rkb,kb->rb", onehot, pred_dis)  # [K(ranks), B]

    diffs = by_rank[:-1] - by_rank[1:]                # want <= 0
    hinge = jnp.maximum(diffs, 0.0)
    # boundary emphasis (x3 at the ends, matching the reference weighting)
    weights = jnp.ones((k - 1, 1)).at[0].set(3.0).at[-1].set(3.0)
    loss = jnp.sum(hinge * weights, axis=0)
    loss_reg = by_rank[0] + (1.0 - by_rank[-1])
    return loss + loss_reg


def retrieval_ranking_anchor_loss(pred_dis: Array,
                                  actual_dis: Array) -> Array:
    """Boundary-only variant (ref ``retrieval_regression_loss6:107-122``):
    pull the best candidate's prediction to 0 and the worst's to 1."""
    k = pred_dis.shape[0]
    order = _ranks(actual_dis)
    onehot = jax.nn.one_hot(order, k, axis=0)
    by_rank = jnp.einsum("rkb,kb->rb", onehot, pred_dis)
    return by_rank[0] + (1.0 - by_rank[-1])
