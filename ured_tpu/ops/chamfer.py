"""Bidirectional nearest-neighbor / Chamfer distance primitives.

TPU-native replacement for the reference CUDA kernels: the brute-force
shared-memory-tiled ``NmDistanceKernel`` (reference
``Density_aware_Chamfer_Distance/utils_v2/metrics/CD/chamfer3D/chamfer3D.cu:12-174``,
plus the 2D/5D variants) and the missing ``Shape_Measure.ChamferLoss`` whose
contract is squared-L2 per-direction costs (usage: reference
``loss/chamfer_loss.py:5-10``).

Design: each direction is a matmul+min/argmin pair that XLA fuses
end-to-end — the [N, M] distance matrix never reaches HBM.  Values and
selection carry the matmul unit's native precision (f32-exact on CPU,
bf16-pass window on the TPU MXU — see ``_nn_both_directions``);
``exact_sqdist_at`` recomputes exact per-point values when a caller needs
them.  A custom VJP propagates gradients only through the selected pairs —
identical to the reference scatter-add backward (``chamfer3D.cu:155-174``)
— and is always the exact gradient of the exact distance at those pairs.

All functions take optional validity masks (1 = valid), which is how the
reference's ragged per-sample slicing (``loss/chamfer_loss.py:13-27``) becomes
fixed-shape batched computation.  Points work in any dimension D (the CUDA
tree templated D=2/3/5; here D is just the trailing axis).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e9

# Read once at import: the dispatch decision is baked into jit caches, so a
# mid-process toggle could never take effect for already-compiled shapes
# anyway — process-lifetime semantics are the honest contract.  For an
# explicit per-call choice use ``nn_distance_pallas`` directly.
_NN_PALLAS = os.environ.get("URED_NN_PALLAS", "0") == "1"


def pairwise_sqdist(x: Array, y: Array, precision=None) -> Array:
    """Squared L2 distances between two point sets.

    Default precision is HIGHEST: TPU's default matmul precision runs bf16
    passes, which leaks ~0.4% rel error into the distances; public callers
    consume the whole materialized matrix (top-k, thresholds, EMD costs),
    where the extra matmul passes at D<=5 are a negligible fraction of the
    [N, M] HBM traffic.  The NN *selection* path passes DEFAULT explicitly —
    there the matrix has a single argmin consumer and XLA fuses the matmul
    into the reduction, which the multi-pass precisions would break
    (measured: 6.0 ms fused vs 13.9 ms at HIGHEST, [16, 16384 vs 2048]).

    Args:
      x: [..., N, D]
      y: [..., M, D]
    Returns:
      [..., N, M] squared distances (may be slightly negative from fp error;
      clamped at 0).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("...nd,...md->...nm", x, y,
                    preferred_element_type=jnp.float32,
                    precision=precision)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def _ones_mask(p: Array) -> Array:
    return jnp.ones(p.shape[:-1], dtype=p.dtype)


def _min_direction(a, b, b_mask):
    """(distance to, index of) the nearest valid ``b`` per ``a`` point.

    Each direction builds its own distance matrix whose only consumers are
    the fused min/argmin reductions: XLA folds the matmul into the
    reduction and the [N, M] matrix is never materialized in HBM.  Sharing
    one matrix between both directions (or raising the matmul precision)
    forces materialization and measures 2x slower at training shapes
    ([16, 16384 vs 2048]: 6.0 ms for two fused passes vs 11.9/13.9 ms
    shared/HIGHEST).
    """
    d = pairwise_sqdist(a, b, precision=jax.lax.Precision.DEFAULT)
    d = d + (_BIG * (1.0 - b_mask))[..., None, :]
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)


def exact_sqdist_at(a, b, idx, b_mask=None):
    """Exact f32 squared distance from each ``a`` point to its selected
    ``b`` neighbor (one [.., N] gather — ~10 ms at [16, 16384] on v5e, so
    the default forward does NOT pay it; call this when per-point values
    must be exact rather than matmul-native precision).  Rows whose
    selected neighbor is invalid keep the +_BIG penalty."""
    b_sel = jnp.take_along_axis(b, idx[..., None], axis=-2)
    dist = jnp.sum((a - b_sel) ** 2, axis=-1)
    if b_mask is None:
        return dist
    sel_valid = jnp.take_along_axis(b_mask, idx, axis=-1)
    return dist + _BIG * (1.0 - sel_valid)


def _nn_both_directions(x, y, x_mask, y_mask):
    """Bidirectional NN via two independently-fused matmul+min passes.

    Values and selection carry the matmul unit's native precision:
    f32-exact on CPU; on the TPU MXU the default (fastest) matmul runs
    bf16 passes, giving an absolute error window ~(|x|^2+|y|^2)*2^-8 on
    the distance VALUES and near-tie selection ambiguity in the same
    window.  Gradients are unaffected — the custom VJP differentiates the
    exact distance at the selected pair.  Callers needing exact per-point
    values use ``exact_sqdist_at`` (costs a gather; means over points see
    the error average out to ~0.05%)."""
    dist1, idx1 = _min_direction(x, y, y_mask)
    dist2, idx2 = _min_direction(y, x, x_mask)
    return dist1, idx1, dist2, idx2


def _pallas_eligible(n: int, m: int) -> bool:
    """Whether to dispatch to the fused Pallas kernel.

    OFF unless ``URED_NN_PALLAS=1``: the fused-argmin XLA path
    (``_nn_both_directions``) measures faster at every live shape on v5e
    (full 4-output contract, [16, 16384 vs 2048]: XLA 6.0 ms vs Pallas
    exact 7.7 / packed 8.3 ms) — the VPU difference tiles can't keep up
    with the fused MXU matmul.  The kernels remain available for
    memory-pressure regimes (XLA's fusion choices can change) and as the
    reference-CUDA-analogue implementation.

    Tile constraints (after any orientation swap): the non-tiled cloud
    lives whole in VMEM as [M, 3] padded to 128 lanes (~512 B/point), so M
    is capped; the tiled side needs a valid tile."""
    if not _NN_PALLAS:
        return False
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

    Distance values and selection carry the matmul unit's native
    precision (see ``_nn_both_directions``); use ``exact_sqdist_at`` for
    exact per-point values.  With ``URED_NN_PALLAS=1`` and tile-aligned
    shapes the forward instead runs the fused Pallas kernel
    (``chamfer_pallas.py``).

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
    return _nn_both_directions(x, y, x_mask, y_mask)


def _nn_distance_fwd(x, y, x_mask, y_mask):
    out = nn_distance(x, y, x_mask, y_mask)
    dist1, idx1, dist2, idx2 = out
    return out, (x, y, x_mask, y_mask, idx1, idx2)


def _scatter_add_rows(idx: Array, val: Array, size: int) -> Array:
    """[N] indices + [N, D] values -> [size, D] scatter-added rows."""
    return jnp.zeros((size, val.shape[-1]), val.dtype).at[idx].add(val)


_scatter_add_batched = jax.vmap(_scatter_add_rows, in_axes=(0, 0, None))


def _segment_rows_fused(idx: Array, val: Array, size: int,
                        reduce_trailing: bool = True) -> Array:
    """Scatter-add as a fused compare-and-reduce.

    XLA's TPU scatter serializes row updates; a broadcast ``idx == iota``
    mask fused into a reduction runs on the VPU without materializing the
    [m, size] mask.  ``reduce_trailing=True`` (sum over the m axis held in
    lanes) measures fastest whenever size <= m — the regime this path is
    dispatched for (4.3 ms vs scatter's 8.2 ms at [16, 16384 -> 2048])."""
    iota = jnp.arange(size, dtype=idx.dtype)
    d = val.shape[-1]
    if reduce_trailing:
        mask = idx[..., None, :] == iota[:, None]          # [..., size, m]
        outs = [jnp.sum(jnp.where(mask, val[..., None, :, k], 0.0), axis=-1)
                for k in range(d)]
    else:
        mask = idx[..., :, None] == iota                   # [..., m, size]
        outs = [jnp.sum(jnp.where(mask, val[..., k:k + 1], 0.0), axis=-2)
                for k in range(d)]
    return jnp.stack(outs, axis=-1)                        # [..., size, D]


def _segment_rows_onehot(idx: Array, val: Array, size: int) -> Array:
    """Scatter-add as a one-hot matmul on the MXU.

    ``onehot(idx)^T @ val`` turns the scatter into a dense matmul; with
    f32 one-hots at HIGHEST precision the result is f32-grade (rel err
    ~2e-7).  Fastest formulation when size > m — the sparse orientation
    where the compare-and-reduce's [size, m] sweep is tall
    (9.1 ms vs fused 13.4 / scatter 14.1 at [16, 2048 -> 16384])."""
    oh = jax.nn.one_hot(idx, size, dtype=val.dtype)        # [..., m, size]
    return jnp.einsum("...ms,...md->...sd", oh, val,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _segment_rows(idx: Array, val: Array, size: int) -> Array:
    """Batched scatter-add, dispatched by backend and orientation
    (measurements in benchmarks/ and the docstrings above)."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu:
        return _scatter_add_batched(idx, val, size)
    m = idx.shape[-1]
    if size > m:
        return _segment_rows_onehot(idx, val, size)
    return _segment_rows_fused(idx, val, size, reduce_trailing=True)


def _nn_distance_bwd(res, cots):
    x, y, x_mask, y_mask, idx1, idx2 = res
    g1, _, g2, _ = cots  # index cotangents are zero (integers)
    n, m = x.shape[-2], y.shape[-2]

    y_nn = jnp.take_along_axis(y, idx1[..., None], axis=-2)  # [B, N, D]
    x_nn = jnp.take_along_axis(x, idx2[..., None], axis=-2)  # [B, M, D]

    # d dist1_n / d x_n = 2 (x_n - y_{idx1_n}); reference chamfer3D.cu:155-174.
    r1 = 2.0 * (g1 * x_mask)[..., None] * (x - y_nn)  # [B, N, D]
    r2 = 2.0 * (g2 * y_mask)[..., None] * (y - x_nn)  # [B, M, D]

    gx = r1 - _segment_rows(idx2, r2, n)
    gy = r2 - _segment_rows(idx1, r1, m)
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

    The f-score thresholds squared distances at 1e-4 — far below the
    selection matmul's native-precision window — so distances are
    recomputed exactly at the selected pairs.
    """
    _, idx1, _, idx2 = chamfer_raw(gt, output)
    dist1 = exact_sqdist_at(gt, output, idx1)
    dist2 = exact_sqdist_at(output, gt, idx2)
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
