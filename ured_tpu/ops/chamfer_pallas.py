"""Pallas TPU kernel for bidirectional nearest neighbors.

The XLA path (``ured_tpu.ops.chamfer``) materializes the [B, N, M] distance
matrix in HBM (~270 MB at training shapes) — correct but bandwidth-bound.
This kernel is the TPU analogue of the reference's shared-memory-tiled CUDA
kernel (``chamfer3D.cu:12-134``): per (batch, x-tile) grid step, the
[TN, M] distance block is produced on the MXU (``x2 + y2 - 2 x @ y^T``) and
immediately reduced — the full matrix never touches HBM.

Row minima (x -> nearest y) write straight to that tile's output block.
Column minima (y -> nearest x) accumulate in VMEM scratch across the
sequential grid steps of one batch element (TPU grids execute in order) and
are flushed on the last tile.  No dynamic slicing anywhere — every memory
access is a whole block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e30

# budget for the [TN, M] f32 distance block (+ inputs/scratch head-room)
# against ~16 MB VMEM per core; y rides as [M, 3] padded to 128 lanes, so
# M itself is bounded by the eligibility check
_BLOCK_ELEMS = 1_500_000


def pick_tile(n: int, m: int, tile_n: int = 512) -> int:
    """Largest x-tile that divides n and fits the VMEM budget.

    Tiles land in the lane dimension of the mask/output blocks, so they
    must be multiples of 128 — or equal to n itself (full-array blocks
    bypass the tiling rule).
    """
    cap = _BLOCK_ELEMS // max(m, 1)
    if n <= cap and n <= tile_n:
        return n
    tn = min(tile_n, n, cap) // 128 * 128
    while tn >= 128:
        if n % tn == 0:
            return tn
        tn -= 128
    return 0


def _nn_kernel(x_ref, y_ref, xm_ref, ym_ref,
               d1_ref, i1_ref, d2_ref, i2_ref,
               colmin, colidx, *, tn: int, num_tiles: int):
    """Grid (B, num_tiles); x blocks [1, TN, 3], y blocks [1, M, 3]."""
    t = pl.program_id(1)

    y = y_ref[0]                                       # [M, 3]
    ypen = _BIG * (1.0 - ym_ref[0, 0])                 # [M]

    @pl.when(t == 0)
    def _():
        colmin[0, :] = jnp.full(colmin.shape[1:], _BIG, jnp.float32)
        colidx[0, :] = jnp.zeros(colidx.shape[1:], jnp.int32)

    xt = x_ref[0]                                      # [TN, 3]
    # direct difference form on the VPU: exact like the CUDA kernel (the
    # |x|^2+|y|^2-2xy matmul form wastes the MXU at K=3 and loses precision
    # through cancellation)
    d = jnp.zeros((xt.shape[0], y.shape[0]), jnp.float32)
    for k in range(3):
        diff = xt[:, k][:, None] - y[:, k][None, :]
        d = d + diff * diff

    # row direction: nearest valid y per x-tile point
    drow = d + ypen[None, :]
    d1_ref[0, 0, :] = jnp.min(drow, axis=1)
    i1_ref[0, 0, :] = jnp.argmin(drow, axis=1).astype(jnp.int32)

    # column direction: accumulate nearest valid x per y across tiles
    xpen = _BIG * (1.0 - xm_ref[0, 0])                 # [TN]
    dcol = d + xpen[:, None]
    tile_min = jnp.min(dcol, axis=0)                   # [M]
    tile_arg = jnp.argmin(dcol, axis=0).astype(jnp.int32) + t * tn
    better = tile_min < colmin[0, :]
    colmin[0, :] = jnp.where(better, tile_min, colmin[0, :])
    colidx[0, :] = jnp.where(better, tile_arg, colidx[0, :])

    @pl.when(t == num_tiles - 1)
    def _():
        d2_ref[0, 0, :] = colmin[0, :]
        i2_ref[0, 0, :] = colidx[0, :]


def nn_distance_pallas(x: Array, y: Array, x_mask: Array, y_mask: Array,
                       tile_n: int = 512, interpret: bool = False):
    """Forward bidirectional NN, Pallas path.

    Same contract as ``chamfer.nn_distance``: (d1 [B,N], i1, d2 [B,M], i2).
    N must divide by ``tile_n`` (2048/1024-point clouds do naturally).
    """
    b, n, _ = x.shape
    m = y.shape[1]
    tn = pick_tile(n, m, tile_n)
    if tn == 0:
        raise ValueError(f"no VMEM-fitting tile for N={n}, M={m}")
    num_tiles = n // tn

    kernel = functools.partial(_nn_kernel, tn=tn, num_tiles=num_tiles)
    vm = pltpu.VMEM
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda i, t: (i, t, 0),
                         memory_space=vm),
            pl.BlockSpec((1, m, 3), lambda i, t: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tn), lambda i, t: (i, 0, t),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m), lambda i, t: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tn), lambda i, t: (i, 0, t),
                         memory_space=vm),
            pl.BlockSpec((1, 1, tn), lambda i, t: (i, 0, t),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m), lambda i, t: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, m), lambda i, t: (i, 0, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * 3,
            bytes_accessed=b * (n + m) * (3 * 4 + 8),
            transcendentals=0),
    )(x, y,
      x_mask.astype(jnp.float32)[:, None, :],
      y_mask.astype(jnp.float32)[:, None, :])
    return d1[:, 0], i1[:, 0], d2[:, 0], i2[:, 0]
