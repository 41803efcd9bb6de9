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

from typing import Optional, Tuple

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


def retrieve_topk(tgt_part_f: Array, src_codes: Array, k: int,
                  src_valid: Optional[Array] = None,
                  chunk: Optional[int] = None) -> Tuple[Array, Array]:
    """Cosine-similarity retrieval (single device).

    tgt_part_f [Q, C], src_codes [S, C] -> (scores [Q, k], idx [Q, k]).
    ``src_valid`` [S]: 0 marks padding rows (a db-sharded DB regathered to
    one device keeps its padding) — they score -1e9 and never rank.

    ``chunk``: optional source-axis tile.  ``lax.top_k`` over a [Q, S] row
    is the hot term at large S (the matmul itself is ~1 ms at S=100k);
    tiling runs top-k per [Q, chunk] block and merges the k-per-block
    candidates — the single-device form of ``sharded_retrieve_topk``'s
    per-shard-then-merge.  Exact for any chunk >= 1 (ties broken by block
    order instead of global index order).
    """
    q = l2_normalize(tgt_part_f)
    s = l2_normalize(src_codes)
    n_src = s.shape[0]
    if chunk is not None and chunk < n_src:
        n_blocks = -(-n_src // chunk)
        s = pad_to_multiple(s, chunk)
        valid = jnp.arange(n_blocks * chunk) < n_src
        if src_valid is not None:
            valid = valid & (pad_to_multiple(src_valid, chunk) > 0)
        sims = jnp.einsum("qc,sc->qs", q, s,
                          preferred_element_type=jnp.float32)
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
        blocks = sims.reshape(q.shape[0], n_blocks, chunk)
        kk = min(k, chunk)
        b_scores, b_idx = jax.lax.top_k(blocks, kk)     # [Q, NB, kk]
        offs = (jnp.arange(n_blocks) * chunk)[None, :, None]
        cand_idx = (b_idx + offs).reshape(q.shape[0], n_blocks * kk)
        cand_scores = b_scores.reshape(q.shape[0], n_blocks * kk)
        scores, sel = jax.lax.top_k(cand_scores, k)
        idx = jnp.take_along_axis(cand_idx, sel, axis=-1)
        return jnp.where(jnp.isfinite(scores), scores, -1e9), \
            idx.astype(jnp.int32)
    sims = jnp.einsum("qc,sc->qs", q, s, preferred_element_type=jnp.float32)
    if src_valid is not None:
        sims = jnp.where(src_valid[None, :] > 0, sims, -1e9)
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx.astype(jnp.int32)


def pad_to_multiple(a: Array, multiple: int, axis: int = 0) -> Array:
    """Zero-pad ``a`` along ``axis`` to the next multiple (sharding a tensor
    over a mesh axis requires divisibility)."""
    size = a.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def sharded_retrieve_topk(tgt_part_f: Array, src_codes: Array, k: int,
                          mesh: Mesh, src_valid: Optional[Array] = None
                          ) -> Tuple[Array, Array]:
    """DB-sharded retrieval: per-shard top-k, then gather + merge.

    The queries are replicated over ``db`` and sharded over ``dp``; the DB is
    sharded over ``db``.  Communication is O(Q * k * db), independent of S.

    ``src_valid`` [S] (1 = real entry) masks padding rows appended by
    ``pad_to_multiple`` so they can never be retrieved (a zero code row
    scores cosine 0, which would outrank genuinely negative similarities).
    """
    s_total = src_codes.shape[0]
    db = mesh.shape["db"]
    if s_total % db:
        raise ValueError(f"source DB size {s_total} not divisible by db={db}")
    shard = s_total // db
    kk = min(k, shard)

    def local(q, db_shard, valid_shard):
        # db_shard: [shard, C] local slice; global index offset by rank
        rank = jax.lax.axis_index("db")
        qn = l2_normalize(q)
        sn = l2_normalize(db_shard)
        sims = jnp.einsum("qc,sc->qs", qn, sn,
                          preferred_element_type=jnp.float32)
        if valid_shard is not None:
            sims = sims - 1e9 * (1.0 - valid_shard)[None, :]
        scores, idx = jax.lax.top_k(sims, kk)
        idx = idx.astype(jnp.int32) + rank * shard
        # gather every shard's winners: [db, Q, kk]
        all_scores = jax.lax.all_gather(scores, "db")
        all_idx = jax.lax.all_gather(idx, "db")
        qn = q.shape[0]
        all_scores = jnp.swapaxes(all_scores, 0, 1).reshape(qn, db * kk)
        all_idx = jnp.swapaxes(all_idx, 0, 1).reshape(qn, db * kk)
        best, pos = jax.lax.top_k(all_scores, min(k, db * kk))
        return best, jnp.take_along_axis(all_idx, pos, axis=-1)

    if src_valid is None:
        fn = jax.shard_map(
            lambda q, s: local(q, s, None), mesh=mesh,
            in_specs=(P("dp", None), P("db", None)),
            out_specs=(P("dp", None), P("dp", None)),
            check_vma=False)
        return fn(tgt_part_f, src_codes)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", None), P("db", None), P("db")),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False)
    return fn(tgt_part_f, src_codes, src_valid)
