"""Differentiable point <-> voxel ops (GRNet family).

TPU-native equivalents of the reference CUDA extensions:

  * ``gridding``         <- ``utils/gridding/gridding.cu`` (334 LoC): scatter
    each point into its 8 surrounding grid vertices with trilinear weights.
  * ``gridding_reverse`` <- ``gridding_reverse.cu``: voxel grid back to a
    point per cell, weighted by corner occupancy.
  * ``cubic_feature_sampling`` <- ``utils/cubic_feature_sampling/*.cu``:
    gather the 8 corner features of each point's cell.

All are jnp scatter/gather ops — XLA differentiates them natively, so no
hand-written backward (the CUDA versions needed explicit grad kernels).
Grids are cubic with ``scale`` vertices per side over [-1, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _corner_weights(points: Array, scale: int):
    """For each point: its 8 surrounding vertex indices + trilinear weights.

    points in [-1, 1]; grid vertex v at coordinate -1 + 2*v/(scale-1).
    Returns (flat corner indices [..., 8], weights [..., 8]).
    """
    g = (points + 1.0) * 0.5 * (scale - 1)             # grid coords
    g = jnp.clip(g, 0.0, scale - 1 - 1e-6)
    lo = jnp.floor(g)
    frac = g - lo
    lo = lo.astype(jnp.int32)

    corners = []
    weights = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = lo[..., 0] + dx
                cy = lo[..., 1] + dy
                cz = lo[..., 2] + dz
                w = (jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                     * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                     * jnp.where(dz, frac[..., 2], 1 - frac[..., 2]))
                corners.append((cx * scale + cy) * scale + cz)
                weights.append(w)
    return jnp.stack(corners, -1), jnp.stack(weights, -1)


@partial(jax.jit, static_argnames=("scale",))
def gridding(points: Array, scale: int = 64) -> Array:
    """Point cloud -> occupancy grid.

    points [B, N, 3] in [-1, 1] -> grid [B, scale, scale, scale] with
    trilinearly-scattered occupancy mass.
    """
    idx, w = _corner_weights(points, scale)            # [B, N, 8]

    def one(ii, ww):
        flat = jnp.zeros((scale ** 3,), points.dtype)
        return flat.at[ii.reshape(-1)].add(ww.reshape(-1))

    grids = jax.vmap(one)(idx, w)
    return grids.reshape(-1, scale, scale, scale)


@partial(jax.jit, static_argnames=("scale",))
def gridding_reverse(grid: Array, scale: int = 64) -> Array:
    """Occupancy grid -> one point per cell (occupancy-weighted average of
    the cell's corner coordinates), mirroring ``gridding_reverse.cu``.

    grid [B, scale, scale, scale] -> points [B, (scale-1)^3, 3]; empty cells
    produce the origin.
    """
    s = scale
    cellcount = (s - 1) ** 3
    flat = grid.reshape(-1, s ** 3)

    ax = jnp.arange(s - 1)
    cx, cy, cz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    base = jnp.stack([cx, cy, cz], -1).reshape(cellcount, 3)  # cell lows

    coords = -1.0 + 2.0 * jnp.arange(s) / (s - 1)

    pts_sum = jnp.zeros((grid.shape[0], cellcount, 3), grid.dtype)
    w_sum = jnp.zeros((grid.shape[0], cellcount), grid.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                vx = base[:, 0] + dx
                vy = base[:, 1] + dy
                vz = base[:, 2] + dz
                vid = (vx * s + vy) * s + vz
                w = flat[:, vid]                       # [B, cells]
                corner = jnp.stack(
                    [coords[vx], coords[vy], coords[vz]], -1)
                pts_sum = pts_sum + w[..., None] * corner[None]
                w_sum = w_sum + w
    return pts_sum / jnp.maximum(w_sum[..., None], 1e-8) \
        * (w_sum[..., None] > 1e-8)


@partial(jax.jit, static_argnames=("scale",))
def cubic_feature_sampling(points: Array, features: Array,
                           scale: int = 64) -> Array:
    """Gather the 8 corner features of each point's grid cell.

    points [B, N, 3] in [-1, 1], features [B, scale^3, C] ->
    [B, N, 8, C] (reference ``cubic_feature_sampling.cu`` contract).
    """
    idx, _ = _corner_weights(points, scale)            # [B, N, 8]

    def one(f, ii):
        return f[ii]                                   # [N, 8, C]

    return jax.vmap(one)(features, idx)
