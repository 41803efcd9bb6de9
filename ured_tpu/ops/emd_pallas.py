"""VMEM-resident auction kernel for the approximate EMD assignment.

The XLA auction (``ops/emd.py``) runs every iteration as its own pass over
the [N, N] value matrix in HBM — at N=1024 that is ~4 MB in and several MB
of temporaries out PER ITERATION, and the eval-quality regime (eps 0.002,
up to 10k iterations, reference ``emd_module.py:16-19``) measures ~2 s per
[8, 1024] batch.  Here the whole auction state (value matrix + price /
owner / assignment vectors) lives in VMEM for the kernel's lifetime and the
iteration loop runs INSIDE the kernel, so an iteration costs a few VPU
passes over VMEM instead of HBM round-trips.

Semantics match ``ops.emd._auction_single``: dense bidding with best /
second-best margins, eps increments, smallest-index tie-breaks, eviction on
ownership change, and an all-assigned early exit.  Tie PATTERNS can differ
from the XLA path in degenerate equal-value cases (both are valid auction
outcomes; the approximation bound — within 2*eps*N of optimal total cost —
is the contract, as for the reference's CUDA auction).

Layout notes (Mosaic): per-bidder state is a [N, 1] column, per-item state
a [1, N] row; every cross interaction is expressed by broadcasting both
into an [N, N] matrix and reducing — never by transposing or by arithmetic
between differently-reduced vectors (the relayout trap documented in
NOTES.md for the DCD kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -1e18

# dispatch flag, read once at import (process-lifetime semantics, same
# convention as URED_NN_PALLAS in ops/chamfer.py).  Default ON: measured on
# v5e at [8, 1024] the kernel beats the XLA auction 1.8x at train quality
# (15.3 vs 27.0 ms) and 4.3x at eval quality (473 vs 2039 ms), bijective in
# both regimes; URED_EMD_PALLAS=0 opts out.  Non-TPU backends and
# non-lane-aligned N always take the XLA path (``auction_eligible``).
EMD_PALLAS = os.environ.get("URED_EMD_PALLAS", "1") == "1"

# [N, N] f32 value matrix + ~2 live matrix temporaries under the ~16 MB
# VMEM budget
_MAX_N = 1024


def _auction_kernel(eps: float, iters: int, early_exit: bool,
                    cost_ref, assign_ref):
    n = cost_ref.shape[1]
    value0 = -cost_ref[0]                                   # [N, N]
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(carry):
        it, price, owner, assign = carry
        # price [1, N] f32; owner [1, N] i32 (item -> bidder, -1 free);
        # assign [N, 1] i32 (bidder -> item, -1 unassigned)
        values = value0 - price                             # [N, N]
        v1 = jnp.max(values, axis=1, keepdims=True)         # [N, 1]
        best = values >= v1                                 # [N, N]
        j1 = jnp.min(jnp.where(best, iota_row, n), axis=1,
                     keepdims=True)                         # [N, 1]
        sel = iota_row == j1                                # [N, N] one-hot
        v2 = jnp.max(jnp.where(sel, _NEG, values), axis=1,
                     keepdims=True)                         # [N, 1]
        bid = (v1 - v2) + eps                               # [N, 1]

        unassigned = assign < 0                             # [N, 1]
        eff = jnp.where(unassigned, bid, _NEG)              # [N, 1]
        e_mat = jnp.where(sel & unassigned, eff, _NEG)      # [N, N]
        best_bid = jnp.max(e_mat, axis=0, keepdims=True)    # [1, N]
        has_winner = best_bid > 0.5 * _NEG                  # [1, N]
        is_w = (e_mat >= best_bid) & (e_mat > 0.5 * _NEG)   # [N, N]
        winner = jnp.min(jnp.where(is_w, iota_col, n), axis=0,
                         keepdims=True)                     # [1, N]

        # per-bidder view of the item-side outcomes, via full matrices
        w_mat = (winner == iota_col) & has_winner           # [N, N]
        won = jnp.min(jnp.where(w_mat, iota_row, n), axis=1,
                      keepdims=True)                        # [N, 1]
        ev_mat = (owner == iota_col) & has_winner           # [N, N]
        evicted = jnp.max(jnp.where(ev_mat, 1, 0), axis=1,
                          keepdims=True) > 0                # [N, 1]

        assign = jnp.where(won < n, won,
                           jnp.where(evicted, -1, assign))
        owner = jnp.where(has_winner, winner, owner)
        price = price + jnp.where(has_winner,
                                  jnp.maximum(best_bid, 0.0), 0.0)
        return it + 1, price, owner, assign

    def cond(carry):
        it, _, _, assign = carry
        return (it < iters) & jnp.any(assign < 0)

    init = (jnp.int32(0),
            jnp.zeros((1, n), jnp.float32),
            jnp.full((1, n), -1, jnp.int32),
            jnp.full((n, 1), -1, jnp.int32))
    if early_exit:
        _, _, owner, _ = jax.lax.while_loop(cond, body, init)
    else:
        # fori fallback (no all-assigned early exit): the body is a fixed
        # point once converged, so results are identical — insurance for
        # backends where while_loop fails to lower inside a kernel
        _, _, owner, _ = jax.lax.fori_loop(
            0, iters, lambda _, c: body(c), init)
    # store the per-ITEM owner row — already [1, N]; writing the per-bidder
    # assign column here would need the [N,1]->[1,N] sublane<->lane
    # relayout this module's layout notes forbid.  The caller inverts it.
    assign_ref[0] = owner


@functools.partial(jax.jit, static_argnames=("eps", "iters", "interpret",
                                             "early_exit"))
def auction_assign_pallas(cost: Array, eps: float, iters: int,
                          interpret: bool = False,
                          early_exit: bool = True) -> Array:
    """cost [B, N, N] -> assignment [B, N] int32 (-1 where unconverged).

    One grid step per batch element; each runs its full early-exiting
    auction with the value matrix resident in VMEM.
    """
    b, n, n2 = cost.shape
    assert n == n2, "auction requires square cost"
    if n > _MAX_N:
        raise ValueError(f"N={n} exceeds the VMEM budget ({_MAX_N})")

    out = pl.pallas_call(
        functools.partial(_auction_kernel, float(eps), int(iters),
                          bool(early_exit)),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
        # the auction state (value matrix + a few [N,N] mask temporaries)
        # peaks ~19 MB at N=1024 — above Mosaic's default 16 MB scoped-VMEM
        # budget but well inside the v5e's 128 MB VMEM; raise the scoped
        # limit instead of splitting the matrix (measured OOM on chip)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost.astype(jnp.float32))
    owner = out[:, 0]                                  # [B, N] item -> bidder
    # invert to bidder -> item (XLA scatter, outside the kernel); bidders
    # owning nothing (unconverged) stay -1
    items = jnp.arange(n, dtype=jnp.int32)

    def invert(own):
        return jnp.full((n,), -1, jnp.int32).at[
            jnp.where(own >= 0, own, n)].set(items, mode="drop")

    return jax.vmap(invert)(owner)


def auction_eligible(n: int) -> bool:
    """Kernel admission: VMEM budget + lane-aligned N + TPU backend."""
    if n > _MAX_N or n % 128:
        return False
    return jax.devices()[0].platform not in ("cpu", "gpu")
