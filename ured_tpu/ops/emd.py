"""Approximate Earth Mover's Distance via the auction algorithm.

TPU-native equivalent of the reference CUDA auction kernel
(``utils_v2/metrics/EMD/emd_cuda.cu``, wrapper ``emd_module.py:40-104``):
a fixed-iteration dense auction — every bidder scores every item through one
[N, N] matrix that rides the MXU, bids are resolved with scatter-max, and the
whole loop is a ``lax.fori_loop`` (compiler-friendly, no data-dependent
control flow).  Like the reference it is *approximate* (``emd_module.py:1-19``
documents the same trade-off) and returns (per-point squared distances of the
assignment, assignment indices); gradients flow to ``x`` only, through the
assigned pairs (``emd_module.py:40-81``).

The reference constrains N to multiples of 1024 and clouds to [0, 1]; this
implementation works for any equal N (memory permitting) but the same
eps/iteration guidance applies: eps=0.005/iters=50 for training-quality
assignments, eps=0.002/iters=10000 for eval-quality.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ured_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array

_NEG = -1e18


def _auction_single(cost: Array, eps: float, iters: int) -> Array:
    """Run the auction for one [N, N] cost matrix.

    Returns assignment [N]: item index assigned to each bidder (bijective up
    to convergence; unconverged bidders keep -1).
    """
    n = cost.shape[0]
    value0 = -cost  # bidders maximize -cost

    def body(_, carry):
        price, owner, assign = carry
        # owner[j]  = bidder currently owning item j (-1 free)
        # assign[i] = item currently owned by bidder i (-1 unassigned)
        unassigned = assign < 0                       # [N]

        values = value0 - price[None, :]              # [N, N]
        # best + second-best via two max passes (lax.top_k sorts the whole
        # lane axis — ~50x slower inside the iteration loop)
        v1 = jnp.max(values, axis=1)
        j1 = jnp.argmax(values, axis=1)               # best item per bidder
        masked = values.at[jnp.arange(n), j1].set(_NEG)
        v2 = jnp.max(masked, axis=1)
        bid = (v1 - v2) + eps                         # bid increment

        # resolve: per item, the highest bidding unassigned bidder wins
        eff_bid = jnp.where(unassigned, bid, _NEG)
        best_bid = jnp.full((n,), _NEG).at[j1].max(eff_bid)
        is_winner = unassigned & (eff_bid >= best_bid[j1]) & (eff_bid > _NEG)
        # tie-break: smallest bidder index among equal bids
        bidder_ids = jnp.arange(n)
        cand = jnp.where(is_winner, bidder_ids, n)
        winner = jnp.full((n,), n).at[j1].min(cand)   # [N] per item
        has_winner = winner < n

        won_items = jnp.where(has_winner, jnp.arange(n), -1)

        # evict previous owners of items that changed hands
        prev_owner = owner
        evicted = jnp.where(has_winner & (prev_owner >= 0), prev_owner, -1)
        assign = assign.at[jnp.where(evicted >= 0, evicted, n)].set(
            -1, mode="drop")
        # record new ownership
        w = jnp.where(has_winner, winner, n)
        assign = assign.at[w].set(jnp.where(has_winner, won_items, 0),
                                  mode="drop")
        owner = jnp.where(has_winner, winner, owner)
        # price update: winning items' prices rise by the winning bid
        winner_bid = jnp.where(has_winner,
                               jnp.maximum(best_bid, 0.0), 0.0)
        price = price + jnp.where(has_winner, winner_bid, 0.0)
        return price, owner, assign

    price = jnp.zeros((n,))
    owner = jnp.full((n,), -1, jnp.int32)
    assign = jnp.full((n,), -1, jnp.int32)
    # Once every bidder is assigned the body is a fixed point (no
    # unassigned bidder -> no bids -> no updates), so a bounded while_loop
    # with a convergence predicate computes the SAME result as running all
    # ``iters`` iterations — but the eval-quality regime (iters=10000,
    # ``emd_module.py:16-19``) stops as soon as the assignment is complete.
    # custom_vjp supplies the gradient, so while_loop's non-reverse-
    # differentiability is irrelevant here.
    def cond(carry):
        i, _, _, assign = carry
        return (i < iters) & jnp.any(assign < 0)

    def step(carry):
        i, price, owner, assign = carry
        price, owner, assign = body(i, (price, owner, assign))
        return i + 1, price, owner, assign

    _, price, owner, assign = jax.lax.while_loop(
        cond, step, (jnp.int32(0), price, owner, assign))
    return assign


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(x: Array, y: Array, eps: float = 0.005,
                iters: int = 50) -> Tuple[Array, Array]:
    """Approximate EMD assignment between equal-size clouds.

    Args:
      x, y: [B, N, D] point clouds.
    Returns:
      (dist [B, N] squared distances of the matched pairs — unassigned
       bidders fall back to their nearest neighbor, matching the unconverged-
       auction behavior of an approximate solver; assignment [B, N] int32).
    """
    cost = pairwise_sqdist(x, y)
    from ured_tpu.ops import emd_pallas

    if emd_pallas.EMD_PALLAS and emd_pallas.auction_eligible(x.shape[-2]):
        # VMEM-resident auction: the whole iteration loop runs inside one
        # kernel instead of streaming the [N, N] matrix through HBM per
        # iteration — default on TPU (1.8x train / 4.3x eval quality on
        # v5e); URED_EMD_PALLAS=0 falls back to the XLA auction below
        assign = emd_pallas.auction_assign_pallas(cost, eps, iters)
    else:
        assign = jax.vmap(_auction_single, in_axes=(0, None, None))(
            cost, eps, iters)
    # fall back to nearest item for unassigned bidders
    nn = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    assign = jnp.where(assign >= 0, assign, nn)
    y_m = jnp.take_along_axis(y, assign[..., None], axis=-2)
    dist = jnp.sum((x - y_m) ** 2, axis=-1)
    return dist, assign


def _emd_fwd(x, y, eps, iters):
    dist, assign = emd_auction(x, y, eps, iters)
    return (dist, assign), (x, y, assign)


def _emd_bwd(eps, iters, res, cots):
    x, y, assign = res
    g, _ = cots
    y_m = jnp.take_along_axis(y, assign[..., None], axis=-2)
    # gradient to x only, matching the reference autograd contract
    gx = 2.0 * g[..., None] * (x - y_m)
    return gx, jnp.zeros_like(y)


emd_auction.defvjp(_emd_fwd, _emd_bwd)


def calc_emd(output: Array, gt: Array, eps: float = 0.005,
             iterations: int = 50) -> Tuple[Array, Array]:
    """Mean sqrt-distance EMD metric (reference
    ``utils_v2/model_utils.py:calc_emd:72-77``)."""
    dist, _ = emd_auction(output, gt, eps, iterations)
    return jnp.sqrt(dist).mean(-1), dist


def emd_reference(x: Array, y: Array) -> Array:
    """Exact EMD oracle via scipy Hungarian assignment (host-side, for
    tests — plays the role of the reference's self-verification
    ``emd_module.py:test_emd:90-104``)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    x = np.asarray(x)
    y = np.asarray(y)
    out = []
    for b in range(x.shape[0]):
        c = ((x[b][:, None] - y[b][None]) ** 2).sum(-1)
        r, cidx = linear_sum_assignment(c)
        out.append(c[r, cidx].mean())
    return np.asarray(out)
