"""Bidirectional nearest-neighbor / Chamfer distance primitives.

TPU-native replacement for the reference CUDA kernels: the brute-force
shared-memory-tiled ``NmDistanceKernel`` (reference
``Density_aware_Chamfer_Distance/utils_v2/metrics/CD/chamfer3D/chamfer3D.cu:12-174``,
plus the 2D/5D variants) and the missing ``Shape_Measure.ChamferLoss`` whose
contract is squared-L2 per-direction costs (usage: reference
``loss/chamfer_loss.py:5-10``).

Design: the pairwise squared-distance matrix is computed as
``|x|^2 + |y|^2 - 2<x, y>`` so the inner product rides the MXU; XLA fuses the
row-min reduction.  A custom VJP propagates gradients only through the argmin
pairs — identical to the reference scatter-add backward
(``chamfer3D.cu:155-174``) — so the [N, M] matrix is never rematerialized for
the backward pass.

All functions take optional validity masks (1 = valid), which is how the
reference's ragged per-sample slicing (``loss/chamfer_loss.py:13-27``) becomes
fixed-shape batched computation.  Points work in any dimension D (the CUDA
tree templated D=2/3/5; here D is just the trailing axis).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e9


def pairwise_sqdist(x: Array, y: Array) -> Array:
    """Squared L2 distances between two point sets.

    Args:
      x: [..., N, D]
      y: [..., M, D]
    Returns:
      [..., N, M] squared distances (may be slightly negative from fp error;
      clamped at 0).
    """
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("...nd,...md->...nm", x, y,
                    preferred_element_type=jnp.float32)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def _ones_mask(p: Array) -> Array:
    return jnp.ones(p.shape[:-1], dtype=p.dtype)


def _nn_one_direction(x, y, y_mask):
    """For each x point, squared distance to + index of nearest valid y."""
    d = pairwise_sqdist(x, y)
    d = d + (_BIG * (1.0 - y_mask))[..., None, :]
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist = jnp.min(d, axis=-1)
    return dist, idx


def _pallas_eligible(n: int, m: int) -> bool:
    """Tile constraints for the fused kernel (after any orientation swap):
    the non-tiled cloud lives whole in VMEM as [M, 3] padded to 128 lanes
    (~512 B/point), so M is capped; the tiled side needs a valid tile."""
    from ured_tpu.ops.chamfer_pallas import pick_tile

    if n < 128 or m % 128 or m > 8192 or pick_tile(n, m) == 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


@jax.custom_vjp
def nn_distance(x: Array, y: Array, x_mask: Array, y_mask: Array):
    """Bidirectional nearest neighbors (masked).

    Mirrors the CUDA forward (``chamfer3D.cu:12-134``): for every point of
    each cloud, the squared distance to and index of its nearest neighbor in
    the other cloud.  Invalid (masked-out) points are never selected as
    neighbors; distances *from* invalid points are still produced and must be
    excluded by the caller's reduction (the masks gate gradients here).

    On TPU with tile-aligned shapes the forward runs as a fused Pallas
    kernel (``chamfer_pallas.py``) that never materializes the [N, M]
    matrix; elsewhere it falls back to the XLA matmul+min path.

    Args:
      x: [B, N, D] points.
      y: [B, M, D] points.
      x_mask: [B, N] validity of x (1 = valid).
      y_mask: [B, M] validity of y.
    Returns:
      (dist1 [B, N], idx1 [B, N], dist2 [B, M], idx2 [B, M]) where
      dist1/idx1 map x -> nearest y and dist2/idx2 map y -> nearest x.
    """
    # The fused kernel wins when the tiled (first) cloud is the long one;
    # for m > n the XLA matmul+argmin path benchmarks faster (the MXU
    # einsum amortizes better than VPU difference tiles), so no swap.
    if x.ndim == 3 and x.shape[-1] == 3 \
            and x.shape[1] >= y.shape[1] \
            and _pallas_eligible(x.shape[1], y.shape[1]):
        from ured_tpu.ops.chamfer_pallas import nn_distance_pallas

        return nn_distance_pallas(x, y, x_mask, y_mask)
    dist1, idx1 = _nn_one_direction(x, y, y_mask)
    dist2, idx2 = _nn_one_direction(y, x, x_mask)
    return dist1, idx1, dist2, idx2


def _nn_distance_fwd(x, y, x_mask, y_mask):
    out = nn_distance(x, y, x_mask, y_mask)
    dist1, idx1, dist2, idx2 = out
    return out, (x, y, x_mask, y_mask, idx1, idx2)


def _scatter_add_rows(idx: Array, val: Array, size: int) -> Array:
    """[N] indices + [N, D] values -> [size, D] scatter-added rows."""
    return jnp.zeros((size, val.shape[-1]), val.dtype).at[idx].add(val)


_scatter_add_batched = jax.vmap(_scatter_add_rows, in_axes=(0, 0, None))


def _nn_distance_bwd(res, cots):
    x, y, x_mask, y_mask, idx1, idx2 = res
    g1, _, g2, _ = cots  # index cotangents are zero (integers)
    n, m = x.shape[-2], y.shape[-2]

    y_nn = jnp.take_along_axis(y, idx1[..., None], axis=-2)  # [B, N, D]
    x_nn = jnp.take_along_axis(x, idx2[..., None], axis=-2)  # [B, M, D]

    # d dist1_n / d x_n = 2 (x_n - y_{idx1_n}); reference chamfer3D.cu:155-174.
    r1 = 2.0 * (g1 * x_mask)[..., None] * (x - y_nn)  # [B, N, D]
    r2 = 2.0 * (g2 * y_mask)[..., None] * (y - x_nn)  # [B, M, D]

    gx = r1 - _scatter_add_batched(idx2, r2, n)
    gy = r2 - _scatter_add_batched(idx1, r1, m)
    return gx, gy, jnp.zeros_like(x_mask), jnp.zeros_like(y_mask)


nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def chamfer_raw(x: Array, y: Array,
                x_mask: Optional[Array] = None,
                y_mask: Optional[Array] = None):
    """``nn_distance`` with optional masks (defaults to all-valid)."""
    if x_mask is None:
        x_mask = _ones_mask(x)
    if y_mask is None:
        y_mask = _ones_mask(y)
    return nn_distance(x, y, x_mask.astype(x.dtype), y_mask.astype(y.dtype))


def masked_mean(v: Array, mask: Optional[Array], axis=-1) -> Array:
    if mask is None:
        return jnp.mean(v, axis=axis)
    num = jnp.sum(v * mask, axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return num / den


def chamfer_distance(x: Array, y: Array,
                     x_mask: Optional[Array] = None,
                     y_mask: Optional[Array] = None) -> Array:
    """Per-batch Chamfer: mean_n d(x_n, y) + mean_m d(y_m, x), squared L2.

    Matches the reference training loss contract
    (``loss/chamfer_loss.py:5-10``): per-direction mean over points, summed
    over directions.  Returns [B].
    """
    d1, _, d2, _ = chamfer_raw(x, y, x_mask, y_mask)
    return masked_mean(d1, x_mask) + masked_mean(d2, y_mask)


def calc_cd(output: Array, gt: Array,
            calc_f1: bool = False,
            f1_threshold: float = 0.0001,
            return_raw: bool = False):
    """cd_p / cd_t metrics, reference ``utils_v2/model_utils.py:calc_cd:53-70``.

    Note the reference calls ``cham_loss(gt, output)`` so dist1 is gt->output.
    """
    dist1, idx1, dist2, idx2 = chamfer_raw(gt, output)
    cd_p = (jnp.sqrt(dist1).mean(-1) + jnp.sqrt(dist2).mean(-1)) / 2.0
    cd_t = dist1.mean(-1) + dist2.mean(-1)
    res = [cd_p, cd_t]
    if calc_f1:
        from ured_tpu.ops.fscore import fscore
        f1, _, _ = fscore(dist1, dist2, f1_threshold)
        res.append(f1)
    if return_raw:
        res.extend([dist1, dist2, idx1, idx2])
    return res


# ---------------------------------------------------------------------------
# Pure-jnp reference oracle (mirrors the role of the reference
# ``chamfer_python.py:distChamfer`` used by its unit tests, SURVEY.md §4).
# ---------------------------------------------------------------------------

def chamfer_reference(x: Array, y: Array):
    """O(N*M*D) direct-difference oracle; no matmul tricks, no masks."""
    diff = x[..., :, None, :] - y[..., None, :, :]
    d = jnp.sum(diff * diff, axis=-1)
    dist1 = jnp.min(d, axis=-1)
    idx1 = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist2 = jnp.min(d, axis=-2)
    idx2 = jnp.argmin(d, axis=-2).astype(jnp.int32)
    return dist1, idx1, dist2, idx2
