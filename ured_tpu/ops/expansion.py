"""Expansion penalty (MSN-style spread regularizer).

TPU-native equivalent of reference
``utils/expansion_penalty/expansion_penalty_cuda.cu`` (198 LoC) +
``expansion_penalty_module.py:23-53``: build the minimum spanning tree of
each decoder primitive's points and penalize edges longer than
``alpha * mean_mst_length``.

The CUDA kernel grows the MST serially; here each primitive's MST comes from
dense Boruvka elimination — O(log n) rounds where every component picks its
minimum outgoing edge (one representative per component, reciprocal edges
deduped), all [n, n] masked reductions, fully jittable with static shapes
(primitives are <= 512 points, so the dense matrix is tiny).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ured_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array

_INF = 1e18


def _mst_edge_lengths(points: Array) -> Tuple[Array, Array]:
    """Boruvka MST of one point set [n, 3].

    Returns (per-point accumulated MST edge lengths [n] — each of the n-1
    edges is credited once, to its chosen representative vertex — and the
    total MST length []).
    """
    n = points.shape[0]
    d = jnp.sqrt(pairwise_sqdist(points[None], points[None])[0] + 1e-12)
    d = d + _INF * jnp.eye(n)
    ids = jnp.arange(n)
    rounds = max(1, (n - 1).bit_length())

    def components(adj):
        """Labels = min vertex id reachable over adj (fixpoint prop)."""
        def cond(carry):
            comp, changed = carry
            return changed

        def step(carry):
            comp, _ = carry
            nbr_min = jnp.min(
                jnp.where(adj, comp[None, :], n), axis=1)
            new = jnp.minimum(comp, nbr_min)
            return (new, jnp.any(new != comp))

        comp, _ = jax.lax.while_loop(cond, step,
                                     (ids, jnp.asarray(True)))
        return comp

    def body(_, carry):
        adj, per_point = carry
        comp = components(adj)
        same = comp[:, None] == comp[None, :]
        dd = jnp.where(same, _INF, d)
        tgt = jnp.argmin(dd, axis=1)                        # [n]
        w = jnp.take_along_axis(dd, tgt[:, None], axis=1)[:, 0]

        # one representative per component: the vertex with minimal (w, id)
        comp_min_w = jnp.full((n,), _INF).at[comp].min(w)
        at_min = w <= comp_min_w[comp] + 1e-12
        cand_id = jnp.where(at_min, ids, n)
        comp_rep = jnp.full((n,), n).at[comp].min(cand_id)  # per comp label
        is_rep = (comp_rep[comp] == ids) & (w < _INF / 2)

        # dedupe reciprocal merges: when components A and B both pick each
        # other they picked the same minimal edge (generic weights); the rep
        # in the higher-id component drops its copy
        other = comp[tgt]
        same_edge_back = (tgt[tgt] == ids)
        drop = is_rep & same_edge_back & is_rep[tgt] & (comp > other)
        record = is_rep & ~drop

        per_point = per_point + jnp.where(record, w, 0.0)

        # connect: add every rep's edge (recorded or reciprocal-dropped)
        safe_t = jnp.where(is_rep, tgt, 0)
        adj = adj.at[jnp.where(is_rep, ids, n), safe_t].set(
            True, mode="drop")
        adj = adj.at[safe_t, jnp.where(is_rep, ids, n)].set(
            True, mode="drop")
        return adj, per_point

    adj0 = jnp.zeros((n, n), bool)
    _, per_point = jax.lax.fori_loop(
        0, rounds, body, (adj0, jnp.zeros((n,))))
    return per_point, jnp.sum(per_point)


def expansion_penalty(points: Array, primitive_size: int,
                      alpha: float = 1.5) -> Tuple[Array, Array, Array]:
    """Spread penalty over decoder primitives.

    Args:
      points: [B, N, 3] with N a multiple of ``primitive_size`` — each
        consecutive block of ``primitive_size`` points is one primitive
        (the reference's layout, ``expansion_penalty_module.py:23-53``).
      alpha: threshold multiplier on the mean MST edge length.
    Returns:
      (per-point penalty [B, N], scalar mean loss, mean MST edge length [B]).
    """
    b, n, _ = points.shape
    if n % primitive_size:
        raise ValueError("N must be a multiple of primitive_size")
    m = n // primitive_size
    prims = points.reshape(b * m, primitive_size, 3)

    per_point, total = jax.vmap(_mst_edge_lengths)(prims)   # [B*M, S]
    mean_edge = total / jnp.maximum(primitive_size - 1, 1)  # [B*M]
    over = jnp.where(per_point > alpha * mean_edge[:, None],
                     per_point, 0.0)
    dist = over.reshape(b, n)
    mean_mst = mean_edge.reshape(b, m).mean(-1)
    loss = jnp.mean(jnp.sum(dist, axis=-1) / m)
    return dist, loss, mean_mst


def mst_total_length_reference(points) -> float:
    """Host-side exact MST total length oracle (scipy) for tests."""
    import numpy as np
    from scipy.sparse.csgraph import minimum_spanning_tree

    d = np.sqrt(((points[:, None] - points[None]) ** 2).sum(-1))
    t = minimum_spanning_tree(d)
    return float(t.sum())
