"""Point-sampling and grouping ops (the PointNet++ CUDA op set).

TPU-native equivalents of the reference's vendored CUDA extensions
(``utils/Pointnet2.PyTorch/pointnet2/src/*.cu``, wrappers
``pointnet2/pointnet2_utils.py:10-39``):

  farthest_point_sample  <- sampling_gpu.cu (block-reduction argmax)
  gather_points          <- gather_points_gpu.cu
  ball_query             <- ball_query_gpu.cu
  group_points           <- group_points_gpu.cu
  three_nn / three_interpolate <- interpolate_gpu.cu

FPS is a ``lax.scan`` over the K iterations with a running min-distance
vector — each iteration is one fused VPU pass over N points; everything else
is gathers / top_k on the MXU-friendly pairwise-distance matmul.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ured_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array

_BIG = 1e10


@partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(points: Array, num_samples: int) -> Array:
    """Iterative farthest point sampling.

    points: [B, N, 3] -> indices [B, num_samples] int32.  Starts from point 0
    (the reference CUDA kernel does the same, ``sampling_gpu.cu``).
    """
    b, n, _ = points.shape

    def step(carry, _):
        min_d, last = carry  # [B, N], [B] index of last chosen
        last_xyz = jnp.take_along_axis(
            points, last[:, None, None], axis=1)       # [B, 1, 3]
        d = jnp.sum((points - last_xyz) ** 2, axis=-1)  # [B, N]
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        return (min_d, nxt), nxt

    init = (jnp.full((b, n), _BIG), jnp.zeros((b,), jnp.int32))
    (_, _), rest = jax.lax.scan(step, init, None, length=num_samples - 1)
    first = jnp.zeros((b, 1), jnp.int32)
    return jnp.concatenate([first, jnp.swapaxes(rest, 0, 1)], axis=1)


def gather_points(points: Array, idx: Array) -> Array:
    """points [B, N, C], idx [B, S] -> [B, S, C]."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def ball_query(radius: float, nsample: int, xyz: Array,
               new_xyz: Array) -> Array:
    """Indices of up to ``nsample`` points of ``xyz`` within ``radius`` of
    each query (reference ``ball_query_gpu.cu`` semantics: first-found order,
    empty slots repeat the first hit; queries with no hits return index 0).

    xyz: [B, N, 3], new_xyz: [B, S, 3] -> [B, S, nsample] int32.
    """
    d = pairwise_sqdist(new_xyz, xyz)                 # [B, S, N]
    in_ball = d < radius * radius                     # [B, S, N]
    n = xyz.shape[1]
    # rank hits by point index among in-ball points (CUDA fills in index
    # order); out-of-ball points pushed past N
    order = jnp.where(in_ball, jnp.arange(n)[None, None, :], n + 1)
    _, idx = jax.lax.top_k(-order, nsample)           # ascending index hits
    idx = idx.astype(jnp.int32)
    hit_rank = jnp.take_along_axis(order, idx, axis=-1)
    valid = hit_rank <= n
    first = idx[..., :1]
    return jnp.where(valid, idx, first)


def group_points(points: Array, idx: Array) -> Array:
    """points [B, N, C], idx [B, S, K] -> [B, S, K, C]."""
    b, s, k = idx.shape
    flat = idx.reshape(b, s * k)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, s, k, points.shape[-1])


def three_nn(unknown: Array, known: Array) -> Tuple[Array, Array]:
    """Three nearest known points per unknown point.

    unknown [B, N, 3], known [B, M, 3] -> (dists [B, N, 3], idx [B, N, 3]),
    squared distances ascending (reference ``interpolate_gpu.cu``).
    """
    from ured_tpu.ops.knn import knn_points

    res = knn_points(unknown, known, 3)  # iterative small-K path
    return res.dists, res.idx


def three_interpolate(features: Array, idx: Array, weight: Array) -> Array:
    """Weighted interpolation of 3-NN features.

    features [B, M, C], idx [B, N, 3], weight [B, N, 3] -> [B, N, C].
    """
    gathered = group_points(features, idx)            # [B, N, 3, C]
    return jnp.sum(gathered * weight[..., None], axis=-2)


def interpolation_weights(dists: Array, eps: float = 1e-8) -> Array:
    """Inverse-distance weights used by PointNet++ feature propagation."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: Array, features: Array = None,
                     use_xyz: bool = True):
    """FPS + ball query + grouping with centered coordinates (the reference's
    pure-torch ``pointnet2_utils.py:sample_and_group:110``).

    Returns (new_xyz [B, S, 3], grouped [B, S, K, C']) where C' = 3(+C).
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = gather_points(xyz, fps_idx)
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_f = group_points(features, idx)
        if use_xyz:
            grouped = jnp.concatenate([grouped_xyz, grouped_f], axis=-1)
        else:
            grouped = grouped_f
    else:
        grouped = grouped_xyz
    return new_xyz, grouped
