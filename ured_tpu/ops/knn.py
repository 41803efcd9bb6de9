"""k-nearest-neighbor queries over point clouds.

TPU-native stand-in for ``pytorch3d.ops.knn_points`` (used by the reference at
``loss/basic_loss.py:257`` and ``dataset/gen_occ_point.py:31``) and the
pure-torch knn helpers in ``utils_v2/model_utils.py:79-107``.  Built on the
same MXU-friendly pairwise-distance matmul as the chamfer kernel plus
``lax.top_k``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ured_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array

_BIG = 1e9


class KNNResult(NamedTuple):
    dists: Array  # [..., N, K] squared distances, ascending
    idx: Array    # [..., N, K] indices into the second cloud
    knn: Optional[Array]  # [..., N, K, D] gathered neighbors (if requested)


def knn_points(p1: Array, p2: Array, K: int,
               p2_mask: Optional[Array] = None,
               return_nn: bool = False) -> KNNResult:
    """For each point of ``p1`` [..., N, D], the K nearest in ``p2`` [..., M, D].

    Results are sorted by ascending distance (matches
    ``pytorch3d.ops.knn_points(..., return_sorted=True)``).  K == 1 takes a
    min/argmin fast path (``lax.top_k`` over a large M axis sorts the whole
    lane dimension — ~30x slower at M = 16k).
    """
    d = pairwise_sqdist(p1, p2)
    if p2_mask is not None:
        d = d + (_BIG * (1.0 - p2_mask.astype(d.dtype)))[..., None, :]
    if K <= 4:
        # iterative min/argmax passes: lax.top_k sorts the entire lane axis
        # and is dramatically slower for small K (see the EMD/eval cases)
        dd = d
        ds, ids = [], []
        for _ in range(K):
            ds.append(jnp.min(dd, axis=-1))
            ids.append(jnp.argmin(dd, axis=-1).astype(jnp.int32))
            dd = jnp.where(
                jax.nn.one_hot(ids[-1], dd.shape[-1], dtype=bool),
                jnp.inf, dd)
        dists = jnp.stack(ds, axis=-1)
        idx = jnp.stack(ids, axis=-1)
    else:
        neg, idx = jax.lax.top_k(-d, K)
        dists = -neg
        idx = idx.astype(jnp.int32)
    nn = None
    if return_nn:
        nn = jnp.take_along_axis(
            p2[..., None, :, :], idx[..., None], axis=-2)
    return KNNResult(dists, idx, nn)


def knn_graph(x: Array, k: int) -> Array:
    """Indices of the k nearest neighbors of each point within one cloud.

    Equivalent to ``knn`` in reference ``utils_v2/model_utils.py:79-85`` and
    ``network/VN/vn_dgcnn_util.py:knn:11`` (includes self as neighbor 0).
    x: [..., N, D] -> [..., N, k] int32.
    """
    return knn_points(x, x, k).idx
