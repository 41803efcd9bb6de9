"""Evaluation metrics.

NDCG@k against DCD-derived relevance replaces the reference's sklearn-on-CPU
scoring (``dataset/dataset_utils.py:cal_retrieval_score:1165-1176``); pure
numpy so it has no sklearn dependency and can be vmapped later if needed.
"""

from __future__ import annotations

import numpy as np


def dcg_score(relevance: np.ndarray, k: int) -> float:
    """DCG with the standard log2 discount over the first k entries."""
    rel = np.asarray(relevance, dtype=np.float64)[:k]
    discounts = 1.0 / np.log2(np.arange(2, rel.size + 2))
    return float(np.sum(rel * discounts))


def ndcg_score(true_relevance: np.ndarray, scores: np.ndarray,
               k: int = 40) -> float:
    """NDCG@k of ranking by ``scores`` against ``true_relevance``.

    Matches sklearn.metrics.ndcg_score semantics for a single query.
    """
    true_relevance = np.asarray(true_relevance, dtype=np.float64)
    order = np.argsort(-np.asarray(scores, dtype=np.float64))
    ranked = true_relevance[order]
    ideal = -np.sort(-true_relevance)
    idcg = dcg_score(ideal, k)
    if idcg <= 0:
        return 0.0
    return dcg_score(ranked, k) / idcg


def ndcg_from_topk(true_relevance: np.ndarray, topk_idx: np.ndarray,
                   k: int = 40) -> float:
    """NDCG@k given only the model's top-k ranked item indices.

    Equivalent to ``ndcg_score(true_relevance, scores, k)`` whenever
    ``topk_idx`` lists the k highest-scoring items in descending score order
    (ties inside the window are irrelevant beyond ordering) — this is what
    lets the device eval step return a [B, P, k] index tensor instead of the
    dense [B, P, S] similarity matrix.
    """
    true_relevance = np.asarray(true_relevance, dtype=np.float64)
    ranked = true_relevance[np.asarray(topk_idx)[:k]]
    ideal = -np.sort(-true_relevance)
    idcg = dcg_score(ideal, k)
    if idcg <= 0:
        return 0.0
    return dcg_score(ranked, k) / idcg


def dcd_relevance(distances: np.ndarray, sigma: float = 0.001) -> np.ndarray:
    """exp(-d^2 / (2 sigma^2)) relevance from DCD distances (reference
    ``dataset_utils.py:1173-1175``)."""
    d = np.asarray(distances, dtype=np.float64)
    return np.exp(-(d ** 2) / (2.0 * sigma ** 2))


def retrieval_topk_accuracy(pred_top1: np.ndarray, dist_rows: np.ndarray,
                            threshold: float, k: int = 10) -> float:
    """Fraction of queries whose predicted source is within the DCD top-k
    (under the distance threshold) or is the single best (reference
    ``dataset_utils.py:get_labels_from_cl:1145-1161``).  Thin mean over
    ``retrieval_accept_mask`` so the two never diverge on tie semantics."""
    pred_top1 = np.asarray(pred_top1)
    if pred_top1.size == 0:
        return 0.0
    mask = retrieval_accept_mask(pred_top1, dist_rows, threshold, k)
    return 100.0 * float(mask.mean())


def retrieval_accept_mask(pred: np.ndarray, dist_rows: np.ndarray,
                          threshold: float, k: int = 10) -> np.ndarray:
    """Vectorized acceptance test of ``retrieval_topk_accuracy``.

    The exact reference contract (``get_labels_from_cl:1145-1161``): a
    retrieval is correct iff it lies in the target part's OWN
    threshold-filtered DCD top-``k`` (``read_pickle_topk`` uses k=10 over
    the cd_m row), or it equals the single nearest source.

    Args:
      pred: [...] predicted source index per query.
      dist_rows: [..., S] the query's own pair distances to every source.
      threshold: cfg.filter_threshold.
    Returns boolean acceptance mask of ``pred.shape``.
    """
    pred = np.asarray(pred)
    dist_rows = np.asarray(dist_rows)
    s = dist_rows.shape[-1]
    kk = min(k, s)
    # full stable argsort, not argpartition: ties straddling the top-k
    # boundary must resolve exactly like the reference's sorted pickle rows
    order = np.argsort(dist_rows, axis=-1, kind="stable")
    topk = order[..., :kk]                                 # [..., k] sorted
    topd = np.take_along_axis(dist_rows, topk, axis=-1)
    in_filtered = np.any((topk == pred[..., None]) &
                         (topd < threshold), axis=-1)
    return in_filtered | (pred == topk[..., 0])


def ndcg_batch(relevance: np.ndarray, topk_idx: np.ndarray,
               k: int = 40) -> np.ndarray:
    """Vectorized NDCG@k over a batch of queries.

    Equivalent to ``ndcg_from_topk`` per row (same contract: ``topk_idx``
    lists each query's highest-scoring items in descending score order) but
    one numpy pass over [..., S] instead of a python loop with an argsort
    per query — the eval stage at reference scale is device-dominated again.

    Args:
      relevance: [..., S] true relevance rows.
      topk_idx: [..., K] ranked item indices (K >= k).
    Returns NDCG@k per query, zeros where IDCG is 0.
    """
    rel = np.asarray(relevance, dtype=np.float64)
    idx = np.asarray(topk_idx)[..., :k]
    kk = idx.shape[-1]
    discounts = 1.0 / np.log2(np.arange(2, kk + 2))
    ranked = np.take_along_axis(rel, idx, axis=-1)
    dcg = np.sum(ranked * discounts, axis=-1)
    # ideal ranking: top-k relevance values in descending order
    s = rel.shape[-1]
    if kk < s:
        part = np.partition(rel, kth=s - kk, axis=-1)[..., s - kk:]
    else:
        part = rel
    ideal = -np.sort(-part, axis=-1)[..., :kk]
    idcg = np.sum(ideal * discounts, axis=-1)
    return np.where(idcg > 0, dcg / np.maximum(idcg, 1e-30), 0.0)
