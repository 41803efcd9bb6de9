"""Source-database-sharded retrieval.

The retrieval hot path (reference ``engine/vis.py:197-206``) is one
similarity matmul ``[B*P, C] @ [C, S]`` + top-k over the whole source DB.
At production scale S is the "long axis" (SURVEY.md §5): we shard S over the
``db`` mesh axis, each device scores and top-k's its shard, then a single
small ``all_gather`` of the per-shard winners is merged — an all-gather over
candidates instead of the reference's chunked 512-at-a-time python loop
(``engine/vis.py:126-145``, ``test.py:125-140``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def l2_normalize(x: Array, axis: int = -1) -> Array:
    """NaN-free-gradient L2 normalization (zero vectors map to zero)."""
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=axis, keepdims=True) + 1e-12)


def encode_source_db(model, variables, src_points: Array, src_sems: Array,
                     batch_size: int = 512) -> Tuple[Array, Array]:
    """Encode the whole source DB in fixed-size chunks.

    Replaces the reference's chunk-of-512 loop (``vis.py:126-145``) — same
    chunking (keeps peak memory bounded), but jitted once and reused.
    Returns (codes [S, C], per_point [S, n, C]).
    """
    s = src_points.shape[0]

    @jax.jit
    def enc(chunk_pts, chunk_sems):
        return model.apply(variables, chunk_pts[None], chunk_sems[None],
                           train=False, method=model.encode_sources)

    codes, pps = [], []
    for i in range(0, s, batch_size):
        pts = src_points[i:i + batch_size]
        sems = src_sems[i:i + batch_size]
        pad = batch_size - pts.shape[0]
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
            sems = jnp.pad(sems, ((0, pad),))
        c, pp = enc(pts, sems)
        codes.append(c[0, : batch_size - pad if pad else batch_size])
        pps.append(pp[0, : batch_size - pad if pad else batch_size])
    return jnp.concatenate(codes), jnp.concatenate(pps)


def retrieve_topk(tgt_part_f: Array, src_codes: Array, k: int
                  ) -> Tuple[Array, Array]:
    """Cosine-similarity retrieval (single device).

    tgt_part_f [Q, C], src_codes [S, C] -> (scores [Q, k], idx [Q, k]).
    """
    q = l2_normalize(tgt_part_f)
    s = l2_normalize(src_codes)
    sims = jnp.einsum("qc,sc->qs", q, s, preferred_element_type=jnp.float32)
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx.astype(jnp.int32)


def sharded_retrieve_topk(tgt_part_f: Array, src_codes: Array, k: int,
                          mesh: Mesh) -> Tuple[Array, Array]:
    """DB-sharded retrieval: per-shard top-k, then gather + merge.

    The queries are replicated over ``db`` and sharded over ``dp``; the DB is
    sharded over ``db``.  Communication is O(Q * k * db), independent of S.
    """
    s_total = src_codes.shape[0]
    db = mesh.shape["db"]
    if s_total % db:
        raise ValueError(f"source DB size {s_total} not divisible by db={db}")
    shard = s_total // db
    kk = min(k, shard)

    def local(q, db_shard):
        # db_shard: [shard, C] local slice; global index offset by rank
        rank = jax.lax.axis_index("db")
        scores, idx = retrieve_topk(q, db_shard, kk)
        idx = idx + rank * shard
        # gather every shard's winners: [db, Q, kk]
        all_scores = jax.lax.all_gather(scores, "db")
        all_idx = jax.lax.all_gather(idx, "db")
        qn = q.shape[0]
        all_scores = jnp.swapaxes(all_scores, 0, 1).reshape(qn, db * kk)
        all_idx = jnp.swapaxes(all_idx, 0, 1).reshape(qn, db * kk)
        best, pos = jax.lax.top_k(all_scores, min(k, db * kk))
        return best, jnp.take_along_axis(all_idx, pos, axis=-1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", None), P("db", None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False)
    return fn(tgt_part_f, src_codes)
