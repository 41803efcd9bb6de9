"""Pallas TPU kernels for bidirectional nearest neighbors.

The default XLA path (``ured_tpu.ops.chamfer``) fuses each direction's
matmul into its min/argmin reduction, so the [B, N, M] matrix never
reaches HBM there either — and it measures faster than these kernels at
every live shape (NOTES.md).  The kernels stay as the explicit,
fusion-independent implementation (XLA's choices can change) and as the
TPU analogue of the reference's shared-memory-tiled CUDA kernel
(``chamfer3D.cu:12-134``): per (batch, x-tile) grid step, the [TN, M]
distance block is produced and immediately reduced in VMEM.

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


# ---------------------------------------------------------------------------
# Packed min+index variant
# ---------------------------------------------------------------------------
#
# The exact kernel above spends most of its time in four reductions per tile
# (min + argmin in each direction).  Packing the distance and the candidate
# index into ONE int32 — non-negative f32 bitcast to int32 preserves order,
# low IDX_BITS mantissa bits replaced by the index — turns each direction
# into a single ``min`` whose value decodes to (distance, winner).  The
# mantissa truncation perturbs selection only between candidates closer than
# ~2^-(23-IDX_BITS) relative (2^-9 ~ 0.2% at 14 bits) — the same near-tie class the
# bf16 selection path accepts — and the wrapper recomputes exact f32
# distances at the selected pairs, so the op satisfies the same
# selection-precision contract as ``ured_tpu.ops.chamfer``'s default path.

_IDX_BITS = 14                       # supports N, M <= 16384
_IDX_MASK = (1 << _IDX_BITS) - 1


def _nn_kernel_packed(x_ref, y_ref, xm_ref, ym_ref,
                      i1_ref, i2_ref, colpack,
                      *, tn: int, num_tiles: int):
    """Grid (B, num_tiles); packed single-min per direction."""
    t = pl.program_id(1)

    y = y_ref[0]                                       # [M, 3]
    m = y.shape[0]
    ypen = _BIG * (1.0 - ym_ref[0, 0])                 # [M]

    @pl.when(t == 0)
    def _():
        colpack[0, :] = jnp.full(colpack.shape[1:], jnp.int32(0x7FFFFFFF))

    xt = x_ref[0]                                      # [TN, 3]
    d = jnp.zeros((tn, m), jnp.float32)
    for k in range(3):
        diff = xt[:, k][:, None] - y[:, k][None, :]
        d = d + diff * diff

    keep = jnp.int32(~_IDX_MASK)

    # row direction: pack column index, one min
    drow = d + ypen[None, :]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (tn, m), 1)
    prow = (jax.lax.bitcast_convert_type(drow, jnp.int32) & keep) | cidx
    i1_ref[0, 0, :] = jnp.min(prow, axis=1) & _IDX_MASK

    # column direction: pack GLOBAL row index, min across tiles via scratch
    xpen = _BIG * (1.0 - xm_ref[0, 0])                 # [TN]
    dcol = d + xpen[:, None]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (tn, m), 0) + t * tn
    pcol = (jax.lax.bitcast_convert_type(dcol, jnp.int32) & keep) | ridx
    colpack[0, :] = jnp.minimum(colpack[0, :], jnp.min(pcol, axis=0))

    @pl.when(t == num_tiles - 1)
    def _():
        i2_ref[0, 0, :] = colpack[0, :] & _IDX_MASK


def nn_indices_pallas_packed(x: Array, y: Array, x_mask: Array,
                             y_mask: Array, tile_n: int = 512,
                             interpret: bool = False):
    """Nearest-neighbor INDICES both directions, packed-min kernel.

    Returns (i1 [B, N], i2 [B, M]).  Selection is exact up to near-ties
    within ~2^-9 relative distance (see module comment); distances are not
    returned — recompute at the selected pairs (exact) in the caller.
    """
    b, n, _ = x.shape
    m = y.shape[1]
    if n > (1 << _IDX_BITS) or m > (1 << _IDX_BITS):
        raise ValueError(f"packed kernel supports N, M <= {1 << _IDX_BITS}")
    tn = pick_tile(n, m, tile_n)
    if tn == 0:
        raise ValueError(f"no VMEM-fitting tile for N={n}, M={m}")
    num_tiles = n // tn

    kernel = functools.partial(_nn_kernel_packed, tn=tn, num_tiles=num_tiles)
    vm = pltpu.VMEM
    i1, i2 = pl.pallas_call(
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
            pl.BlockSpec((1, 1, m), lambda i, t: (i, 0, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * 3,
            bytes_accessed=b * (n + m) * (3 * 4 + 4),
            transcendentals=0),
    )(x, y,
      x_mask.astype(jnp.float32)[:, None, :],
      y_mask.astype(jnp.float32)[:, None, :])
    return i1[:, 0], i2[:, 0]


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


# ---------------------------------------------------------------------------
# Segment-sum (scatter-add) via MXU one-hot tiles
# ---------------------------------------------------------------------------
#
# The chamfer backward scatters per-point gradient rows into the opposite
# cloud (reference ``chamfer3D.cu:155-174`` uses atomicAdd).  On TPU the
# fastest XLA formulation materializes a [m, size] one-hot in HBM and
# matmuls it (9.1 ms at [16, 2048 -> 16384]); this kernel builds the
# one-hot TILES in VMEM instead — compare + dot per (batch, size-tile) grid
# step — so nothing quadratic ever reaches HBM.
#
# Measured on v5e: 13.0 ms vs the HBM one-hot's 8.9 ms at
# [16, 2048 -> 16384] — the 512-step grid and the D=3-of-128-lane MXU
# waste cost more than the saved HBM traffic, so ``ops.chamfer`` does NOT
# dispatch here; the kernel stays as the no-quadratic-HBM alternative
# (parity-tested in tests/ and on-chip).

def _segsum_kernel(idx_ref, val_ref, out_ref, *, ts: int):
    s = pl.program_id(1)
    idx = idx_ref[0, 0]                                 # [m]
    val = val_ref[0]                                    # [m, D]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], ts), 1) + s * ts
    oh = (idx[:, None] == iota).astype(val.dtype)       # [m, ts]
    # HIGHEST: the MXU's default bf16 passes would round the accumulated
    # values; one-hot rows are bf16-exact but val is not
    out_ref[0] = jax.lax.dot_general(
        oh, val, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # [ts, D]


def segment_rows_pallas(idx: Array, val: Array, size: int,
                        tile_s: int = 512,
                        interpret: bool = False) -> Array:
    """Batched scatter-add ``out[b, idx[b, i]] += val[b, i]``.

    Args:
      idx: [B, m] int32 target rows (must be < size; out-of-range indices
        contribute nothing, matching one-hot semantics).
      val: [B, m, D] rows to add.
      size: number of output rows (multiple of ``tile_s``).
    Returns:
      [B, size, D] f32.
    """
    b, m = idx.shape
    d = val.shape[-1]
    if size % tile_s:
        raise ValueError(f"size {size} must divide by tile_s {tile_s}")
    # VMEM: one-hot [m, tile_s] f32 + val [m, d->128 lanes] + idx [m]
    if m * (tile_s + 132) * 4 > 12_000_000:
        raise ValueError(f"m={m} too large for the VMEM one-hot tile")
    kernel = functools.partial(_segsum_kernel, ts=tile_s)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(b, size // tile_s),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda i, s: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, m, d), lambda i, s: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec((1, tile_s, d), lambda i, s: (i, s, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, size, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * size * d,
            bytes_accessed=b * (m * 4 + m * d * 4 + size * d * 4),
            transcendentals=0),
    )(idx[:, None, :], val)
    return out
