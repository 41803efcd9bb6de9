"""Fused per-pair DCD Pallas kernel for the pair-archive job.

The pair archive (reference offline stage 3, ``engine/generate_pair.py:
55-135``) evaluates DCD between every (target part, source part) cloud pair
— at reference scale ~76M pairs of [1024] x [1024] clouds.  The composable
XLA path (``ops.dcd.calc_dcd``) pays HBM round-trips for its pieces: the
exact-distance gather and the density-count scatter each stream [B, N, M]-
or [B, N, N]-sized intermediates (~66 ms per 1024-pair chunk measured on
v5e; the arithmetic itself is ~10 ms).

This kernel computes ONE pair entirely in VMEM per grid step: the [N, M]
distance block (4 MB at 1024^2), exact min distances, and the density
weights — and writes only four per-point vectors back (~16 KB per pair vs
the megabytes of streamed intermediates).  The scalar DCD/CD metrics
combine outside on the [B, N]-shaped outputs (fused elementwise, trivial).

Layout discipline (Mosaic): every reduction is along the LANE axis of a
row-major matrix — the y->x direction gets its own swapped difference
matrix instead of transposing reduced vectors (relayouts of lane-reduced
vectors are unsupported).  The density count avoids scatter/gather
entirely:

  E[i, j]    = exact-argmin one-hot of row i (smallest index among exact
               min ties via a masked lane-min — ``jnp.argmin`` semantics)
  counts[j]  = sum_i E[i, j]          (axis-0 sum -> lane-replicated row)
  w[i]       = sum_j E[i, j]*counts[j] (axis-1 sum -> column)

which is mathematically the reference's ``scatter_add_`` + ``index_select``
(``model_utils.py:34-44``).  Distances AND count attribution are exact f32
— no bf16 selection window, no exact-recompute step, no mantissa
truncation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# [N, M] distance block + per-direction vectors live at once; keep the
# pair under the ~16 MB/core VMEM budget with head-room
_MAX_PAIR_ELEMS = 1_200_000

# pairs per grid step (read once at import; process-lifetime semantics like
# URED_NN_PALLAS): >1 loops several pairs inside one kernel invocation,
# amortizing per-step setup — A/B knob for the archive job
_PAIRS_PER_STEP = int(os.environ.get("URED_DCD_PPS", "1"))


def _direction(a, b):
    """a [K, 3] -> nearest-in-b stats, all lane-axis reductions.

    Returns (dist [K] exact f32 min squared distance,
             w [K] density count of the selected neighbor).
    """
    k = a.shape[0]
    m = b.shape[0]
    d = jnp.zeros((k, m), jnp.float32)
    for c in range(3):
        diff = a[:, c][:, None] - b[:, c][None, :]
        d = d + diff * diff

    dist = jnp.min(d, axis=1)                          # exact values

    # exact-argmin one-hot: among exact-min ties take the smallest index
    # (``jnp.argmin`` semantics) via a masked lane-min — no packing, no
    # mantissa truncation
    cidx = jax.lax.broadcasted_iota(jnp.int32, (k, m), 1)
    ties = d == dist[:, None]                          # [K, M]
    first = jnp.min(jnp.where(ties, cidx, jnp.int32(m)), axis=1)
    e = (cidx == first[:, None]).astype(jnp.float32)   # [K, M] one-hot
    counts = jnp.sum(e, axis=0)                        # [M] replicated row
    w = jnp.sum(e * counts[None, :], axis=1)           # [K] column
    return dist, w


def _pair_dcd_kernel(x_ref, y_ref, d1_ref, w1_ref, d2_ref, w2_ref, *,
                     pairs: int):
    """Grid (B/pairs,); ``pairs`` (x [N, 3], y [M, 3]) pairs per step.

    Convention follows ``calc_dcd(x, gt)`` with ``x=x_ref``, ``gt=y_ref``
    (reference ``model_utils.py:calc_dcd:13-51``): direction 1 maps each
    gt (y) point to its nearest x point, direction 2 the reverse.  The
    per-pair loop reuses one [N, M] VMEM block sequentially, so ``pairs``
    scales grid-step work without scaling the VMEM footprint.
    """
    def one(j, _):
        x = x_ref[j]                                   # [N, 3]
        y = y_ref[j]                                   # [M, 3]
        d2, w2 = _direction(x, y)                      # x -> nearest y
        d1, w1 = _direction(y, x)                      # y -> nearest x
        d1_ref[j, 0, :] = d1
        w1_ref[j, 0, :] = w1
        d2_ref[j, 0, :] = d2
        w2_ref[j, 0, :] = w2
        return 0

    if pairs == 1:
        one(0, 0)
    else:
        jax.lax.fori_loop(0, pairs, one, 0)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "interpret", "pairs_per_step"))
def pair_dcd_pallas(x: Array, y: Array, alpha: float = 1000.0,
                    interpret: bool = False,
                    pairs_per_step: int | None = None):
    """Batched fused DCD values: x [B, N, 3], y [B, M, 3] ->
    (dcd, cd_p, cd_t) each [B].  ``n_lambda`` is fixed at the reference
    pair-job setting of 1.  ``pairs_per_step`` (default: the
    ``URED_DCD_PPS`` env var, 1) loops that many pairs inside each grid
    step; B is padded up to a multiple (padding rows computed then
    discarded)."""
    b, n, _ = x.shape
    m = y.shape[1]
    if n * m > _MAX_PAIR_ELEMS:
        raise ValueError(f"pair [N={n}, M={m}] exceeds the VMEM budget")
    pp = _PAIRS_PER_STEP if pairs_per_step is None else int(pairs_per_step)
    pp = max(1, min(pp, b))
    b_pad = -(-b // pp) * pp
    xp = x.astype(jnp.float32)
    yp = y.astype(jnp.float32)
    if b_pad != b:
        xp = jnp.concatenate(
            [xp, jnp.zeros((b_pad - b, n, 3), jnp.float32)])
        yp = jnp.concatenate(
            [yp, jnp.zeros((b_pad - b, m, 3), jnp.float32)])

    vm = pltpu.VMEM
    d1, w1, d2, w2 = pl.pallas_call(
        functools.partial(_pair_dcd_kernel, pairs=pp),
        grid=(b_pad // pp,),
        in_specs=[
            pl.BlockSpec((pp, n, 3), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((pp, m, 3), lambda i: (i, 0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((pp, 1, m), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((pp, 1, m), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((pp, 1, n), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((pp, 1, n), lambda i: (i, 0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1, n), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b_pad * (2 * 3 * 2 * n * m + 4 * n * m),
            bytes_accessed=b_pad * (n + m) * (3 + 2) * 4,
            transcendentals=0),
    )(xp, yp)
    d1, w1, d2, w2 = d1[:b, 0], w1[:b, 0], d2[:b, 0], w2[:b, 0]

    # scalar metrics on [B, N]/[B, M] vectors — fused elementwise in XLA
    # (reference weight/loss combination, model_utils.py:31-49, n_lambda=1)
    frac_12 = n / m
    frac_21 = m / n
    loss1 = jnp.mean(1.0 - jnp.exp(-d1 * alpha) / (w1 + 1e-6) * frac_21, -1)
    loss2 = jnp.mean(1.0 - jnp.exp(-d2 * alpha) / (w2 + 1e-6) * frac_12, -1)
    cd_p = (jnp.sqrt(d1).mean(-1) + jnp.sqrt(d2).mean(-1)) / 2.0
    cd_t = d1.mean(-1) + d2.mean(-1)
    return (loss1 + loss2) / 2.0, cd_p, cd_t


def pair_dcd_eligible(n: int, m: int) -> bool:
    """Whether the fused kernel's VMEM budget admits this pair shape (and
    a TPU-family backend is active)."""
    if n * m > _MAX_PAIR_ELEMS:
        return False
    return jax.devices()[0].platform not in ("cpu", "gpu")
