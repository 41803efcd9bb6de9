"""Analytic box-deformation forward and masked part utilities.

The parametric deformation model: each source part carries a per-point linear
map ``A`` [3n, 6] such that ``points = A @ (t, s)`` for translation t and
per-axis half-scale s (built offline, reference
``engine/run_preprocessing.py:compute_param_linear_equation:118``).  The
network predicts 6 deltas per part; the deformed part is
``A @ (alpha * delta + default_param)`` (reference
``dataset/dataset_utils.py:get_shape:691-726``).

The reference's ragged per-sample python loops over parts
(``engine/train.py:get_part:103-136``) become fixed-shape masked segment
reductions here: part labels in [0, P) index a padded parts axis, and
everything is einsum / scatter so XLA maps it onto the MXU/VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e9


def get_shape(A: Array, params: Array,
              default_param: Optional[Array] = None,
              alpha: float = 1.0,
              connectivity: Optional[Array] = None) -> Array:
    """Batched deformation forward.

    Args:
      A: [B, P, 3n, 6] per-part parametric model (points_mat).
      params: [B, P, 6] predicted deformation deltas.
      default_param: [B, P, 6] rest-pose (t, s) of each part, or None.
      alpha: step scale (reference cfg["alpha"], live value 0.1).
      connectivity: optional constraint projection applied to the final
        (absolute) params before the A map, either
          * [B, 6P, 6P] — the reference's whole-shape null-space projector
            coupling all parts' params (``dataset_utils.py:get_shape:
            693,712-722``, the [bs, 96, 96] ``connectivity_mat``; built by
            ``data.preprocessing.constraint_projection``).  Joint
            constraints ``C @ p = 0`` hold exactly on the output.
          * [B, P, 6, 6] — independent per-part blocks (no cross-part
            coupling; kept for diagonal-only uses).
    Returns:
      [B, P, n, 3] deformed part point clouds.
    """
    p = alpha * params
    if default_param is not None:
        p = p + default_param
    if connectivity is not None:
        if connectivity.ndim == 3:      # [B, 6P, 6P] whole-shape coupling
            b_, p_, _ = p.shape
            flat = jnp.einsum("bij,bj->bi", connectivity,
                              p.reshape(b_, p_ * 6),
                              preferred_element_type=jnp.float32)
            p = flat.reshape(b_, p_, 6)
        else:                           # [B, P, 6, 6] per-part blocks
            p = jnp.einsum("bpij,bpj->bpi", connectivity, p)
    out = jnp.einsum("bpkd,bpd->bpk", A, p,
                     preferred_element_type=jnp.float32)
    b, np_ = A.shape[0], A.shape[1]
    return out.reshape(b, np_, -1, 3)


def get_symmetric(pc: Array) -> Array:
    """Reflect across the x=0 plane (reference ``dataset_utils.py:1194``)."""
    return pc * jnp.array([-1.0, 1.0, 1.0], pc.dtype)


def icp_forward(A: Array, params: Array,
                connectivity: Optional[Array] = None) -> Array:
    """Absolute-parameter deformation forward (reference
    ``dataset_utils.py:icp_forward:775-788``): like ``get_shape`` but the
    params already include the rest pose.  A [B, P, 3n, 6], params [B, P, 6].
    """
    return get_shape(A, params, default_param=None, alpha=1.0,
                     connectivity=connectivity)


def get_param_init(params: Array, default_param: Array,
                   alpha: float = 1.0) -> Array:
    """Network deltas -> absolute params for ICP initialization (reference
    ``dataset_utils.py:get_param_init:741``): p_abs = alpha * delta + p0."""
    return alpha * params + default_param


def fit_params_icp(A: Array, init_params: Array, target: Array,
                   iters: int = 10,
                   target_mask: Optional[Array] = None,
                   damping: float = 1e-6,
                   connectivity: Optional[Array] = None) -> Array:
    """ICP refinement of absolute box parameters (the post-process the
    reference initializes with ``get_param_init``/``icp_forward``).

    Each iteration: deform with current params, match every deformed point
    to its nearest target point (``nn_distance``), then solve the linear
    least squares ``A p = matched`` per part — exact because the deformation
    is linear in p.  Fully jittable (``lax.fori_loop`` + 6x6 solves).

    Args:
      A: [B, P, 3n, 6]; init_params [B, P, 6] absolute; target [B, M, 3].
      connectivity: optional [B, 6P, 6P] whole-shape null-space projector
        (reference ``icp_forward``'s ``connectivity_mat``,
        ``dataset_utils.py:775-788``) — each iterate is projected back onto
        the joint-constraint manifold (projected least squares), so the
        returned params keep ``C @ p = 0`` exactly.
    Returns refined absolute params [B, P, 6].
    """
    b, p, k3, _ = A.shape
    n = k3 // 3
    A_r = A.reshape(b * p, n, 3, 6)
    # normal-equation matrices are constant across iterations
    ata = jnp.einsum("qnid,qnie->qde", A_r, A_r) \
        + damping * jnp.eye(6)[None]

    def body(_, params):
        shape = icp_forward(A, params.reshape(b, p, 6),
                            connectivity=connectivity)        # [B, P, n, 3]
        flat = shape.reshape(b, p * n, 3)
        from ured_tpu.ops.chamfer import chamfer_raw

        _, idx1, _, _ = chamfer_raw(flat, target, None, target_mask)
        matched = jnp.take_along_axis(
            target, idx1[..., None], axis=-2)                 # [B, P*n, 3]
        m = matched.reshape(b * p, n, 3)
        atb = jnp.einsum("qnid,qni->qd", A_r, m)
        new = jnp.linalg.solve(ata, atb[..., None])[..., 0]   # [B*P, 6]
        if connectivity is not None:
            flat_new = jnp.einsum("bij,bj->bi", connectivity,
                                  new.reshape(b, p * 6))
            new = flat_new.reshape(b * p, 6)
        return new

    out = jax.lax.fori_loop(0, iters, body,
                            init_params.reshape(b * p, 6))
    return out.reshape(b, p, 6)


def compute_aabbox(points: Array, mask: Optional[Array] = None) -> Array:
    """Axis-aligned box (center, half-scale) of a point set.

    Mirrors reference ``dataset_utils.py:compute_aabbox:77-85`` — returns
    concat(c, s) with s the *half* extents.  points: [..., N, 3],
    mask: [..., N] validity; fully-masked sets return zeros.
    """
    if mask is None:
        mn = jnp.min(points, axis=-2)
        mx = jnp.max(points, axis=-2)
    else:
        m = mask[..., None].astype(bool)
        mn = jnp.min(jnp.where(m, points, _BIG), axis=-2)
        mx = jnp.max(jnp.where(m, points, -_BIG), axis=-2)
        empty = ~jnp.any(m, axis=-2)
        mn = jnp.where(empty, 0.0, mn)
        mx = jnp.where(empty, 0.0, mx)
    c = (mn + mx) / 2.0
    s = (mx - mn) / 2.0
    return jnp.concatenate([c, s], axis=-1)


def part_segment_mean(per_point: Array, labels: Array, num_parts: int
                      ) -> Tuple[Array, Array, Array]:
    """Mean-pool per-point features into per-part features.

    Replaces the ragged loop in reference ``engine/train.py:103-136``.

    Args:
      per_point: [B, N, C] per-point features.
      labels: [B, N] int part ids in [0, num_parts).
      num_parts: P (padded parts axis).
    Returns:
      (part_f [B, P, C] means, part_mask [B, P] 1 where the part has points,
       counts [B, P]).
    """
    onehot = jax.nn.one_hot(labels, num_parts, dtype=per_point.dtype)
    counts = jnp.sum(onehot, axis=-2)                       # [B, P]
    sums = jnp.einsum("bnp,bnc->bpc", onehot, per_point,
                      preferred_element_type=jnp.float32)
    mean = sums / jnp.maximum(counts, 1.0)[..., None]
    part_mask = (counts > 0).astype(per_point.dtype)
    return mean, part_mask, counts


def part_aabb(points: Array, labels: Array, num_parts: int) -> Array:
    """Per-part AABB (c, s): [B, N, 3] + [B, N] labels -> [B, P, 6].

    Vectorized form of the per-part ``compute_aabbox`` calls in reference
    ``engine/train.py:113`` — empty parts yield zeros.
    """
    def one(pts, lab):
        mn = jnp.full((num_parts, 3), _BIG, pts.dtype).at[lab].min(pts)
        mx = jnp.full((num_parts, 3), -_BIG, pts.dtype).at[lab].max(pts)
        empty = mn[:, :1] > mx[:, :1]
        mn = jnp.where(empty, 0.0, mn)
        mx = jnp.where(empty, 0.0, mx)
        return jnp.concatenate([(mn + mx) / 2.0, (mx - mn) / 2.0], axis=-1)
    return jax.vmap(one)(points, labels)


def gather_part_feature(part_f: Array, labels: Array) -> Array:
    """Broadcast each part's feature back to its points.

    part_f: [B, P, C], labels: [B, N] -> [B, N, C].  Used to build the
    residual-net input concat(per_point_f, its part's mean feature)
    (reference ``engine/train.py:124-126``).
    """
    return jnp.take_along_axis(part_f, labels[..., None], axis=-2)


def group_points_by_part(points: Array, labels: Array, num_parts: int,
                         points_per_part: int) -> Tuple[Array, Array]:
    """Pack a labeled cloud into a dense [B, P, n, 3] tensor + validity mask.

    The reference keeps ragged per-part point lists (``part_x`` in
    ``engine/train.py:110-116``); here each part gets a fixed slot of
    ``points_per_part`` points, filled in order of appearance and padded by
    repeating the part's first point (so masked chamfer reductions see no
    spurious geometry; the mask excludes padding anyway).

    Returns:
      (grouped [B, P, n, 3], valid [B, P, n]).
    """
    b, n, _ = points.shape

    def one(pts, lab):
        onehot = jax.nn.one_hot(lab, num_parts, dtype=jnp.int32)  # [N, P]
        # rank of each point within its part (0-based, order of appearance)
        rank = jnp.cumsum(onehot, axis=0) - onehot                # [N, P]
        slot = jnp.sum(rank * onehot, axis=-1)                    # [N]
        slot = jnp.minimum(slot, points_per_part - 1)
        flat_idx = lab * points_per_part + slot
        grouped = jnp.zeros((num_parts * points_per_part, 3), pts.dtype)
        grouped = grouped.at[flat_idx].set(pts)
        filled = jnp.zeros((num_parts * points_per_part,), jnp.int32)
        filled = filled.at[flat_idx].set(1)
        grouped = grouped.reshape(num_parts, points_per_part, 3)
        valid = filled.reshape(num_parts, points_per_part)
        # pad empty slots with the part's first point
        first = grouped[:, :1, :]
        grouped = jnp.where(valid[..., None] > 0, grouped, first)
        return grouped, valid.astype(pts.dtype)

    return jax.vmap(one)(points, labels)
