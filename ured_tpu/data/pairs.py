"""Pseudo-ground-truth generation: pairwise DCD distances + label tables.

Replaces the reference's offline stage 3 (``engine/generate_pair.py``:
joblib over 48 processes, one CUDA DCD call per (part, source) pair, one
pickle per part) with a single tiled on-device job: the full
[Q, S] x {dcd, cd_s, cd_m} distance tensor is computed in jitted chunks
(each chunk is one batched chamfer over bq*bs pairs riding the MXU), then
the pseudo-label selection of ``dataset_utils.py:get_labels:1101-1143`` —
top-k by cd_m, distance threshold, semantic agreement, mutual-similarity
masking — runs once over the whole corpus instead of per training step.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.ops.dcd import calc_dcd

Array = jax.Array


def _chunk_core(q: Array, s: Array, alpha: float, fused: bool):
    """q [bq, n, 3], s [bs, m, 3] -> stacked (dcd, cd_s, cd_m) [3, bq, bs].

    ``fused`` dispatches to the per-pair VMEM Pallas kernel
    (``ops.dcd_pallas``) — ~6x the XLA path's throughput at [1024]x[1024]
    pairs on v5e (the composable path round-trips its gather/scatter
    intermediates through HBM)."""
    bq, n, _ = q.shape
    bs, m, _ = s.shape
    qq = jnp.repeat(q, bs, axis=0)                    # [bq*bs, n, 3]
    ss = jnp.tile(s, (bq, 1, 1))                      # [bq*bs, m, 3]
    if fused:
        from ured_tpu.ops.dcd_pallas import pair_dcd_pallas

        dcd, cd_p, cd_t = pair_dcd_pallas(qq, ss, alpha=alpha)
    else:
        dcd, cd_p, cd_t = calc_dcd(qq, ss, alpha=alpha)
    return jnp.stack([dcd.reshape(bq, bs), cd_p.reshape(bq, bs),
                      cd_t.reshape(bq, bs)])


@partial(jax.jit, static_argnames=("alpha", "fused"))
def _pair_chunk(q: Array, s: Array, alpha: float = 1000.0,
                fused: bool = False):
    """q [bq, n, 3], s [bs, m, 3] -> (dcd, cd_s, cd_m) each [bq, bs]."""
    out = _chunk_core(q, s, alpha, fused)
    return out[0], out[1], out[2]


def _make_sharded_row_fn(mesh, chunk_q: int, chunk_s: int,
                         alpha: float, fused: bool):
    """One dispatch computes a whole [chunk_q, S_pad] row block with the
    source axis sharded over *every* mesh device (dp and db axes flattened)
    and the per-device chunks scanned on device — the multi-chip form of
    the pair-archive job (SURVEY §5: the long axis that needs scaling is
    the source database; preprocessing's O(T*S) matrix shards the same
    way as retrieval)."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def row(qi, s_all):
        # s_all: [S_loc, m, 3] local shard; scan local chunks on device
        nloc = s_all.shape[0] // chunk_s
        s_chunks = s_all.reshape(nloc, chunk_s, *s_all.shape[1:])
        outs = jax.lax.map(lambda sj: _chunk_core(qi, sj, alpha, fused),
                           s_chunks)                  # [nloc, 3, bq, bs]
        out = jnp.moveaxis(outs, 1, 0)                # [3, nloc, bq, bs]
        out = jnp.swapaxes(out, 1, 2)                 # [3, bq, nloc, bs]
        return out.reshape(3, chunk_q, nloc * chunk_s)

    return jax.jit(jax.shard_map(
        row, mesh=mesh,
        in_specs=(P(), P(axes)), out_specs=P(None, None, axes)))


def _resume_state(resume_dir: str, q_n: int, s_n: int):
    """Memmap-backed partial outputs + completed-row marker, so an
    interrupted job (host crash, wedged device RPC killed by a watchdog)
    restarts from the last finished row block instead of from zero."""
    import os

    os.makedirs(resume_dir, exist_ok=True)
    out = {}
    recreated = False
    for k in ("dcd", "cd_s", "cd_m"):
        p = os.path.join(resume_dir, f"{k}.npy")
        if os.path.exists(p):
            m = np.lib.format.open_memmap(p, mode="r+")
            if m.shape != (q_n, s_n):
                m = np.lib.format.open_memmap(p, mode="w+", dtype=np.float32,
                                              shape=(q_n, s_n))
                recreated = True
        else:
            m = np.lib.format.open_memmap(p, mode="w+", dtype=np.float32,
                                          shape=(q_n, s_n))
            recreated = True
        out[k] = m
    marker = os.path.join(resume_dir, "rows_done")
    start = 0
    if recreated:
        # a stale marker from a different-shape (or partially created) job
        # must not skip rows that are now zeros
        if os.path.exists(marker):
            os.remove(marker)
    elif os.path.exists(marker):
        try:
            start = int(open(marker).read().strip() or 0)
        except ValueError:
            start = 0
    return out, marker, start


def _mark_rows(marker: str, rows_done: int) -> None:
    import os

    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(rows_done))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)


def pair_distance_matrix(queries: np.ndarray, sources: np.ndarray,
                         chunk_q: int = 16, chunk_s: int = 64,
                         alpha: float = 1000.0,
                         progress: bool = True,
                         resume_dir: Optional[str] = None,
                         mesh=None) -> Dict[str, np.ndarray]:
    """Full pair-distance tensor between query parts and source parts.

    queries [Q, n, 3], sources [S, m, 3] -> {'dcd', 'cd_s', 'cd_m'} [Q, S]
    (the reference's per-part pickle keys, ``generate_pair.py:82``).

    Dispatch is pipelined per query row: all S/chunk_s chunk calls of a row
    are enqueued asynchronously, then read back in one batched
    ``jax.device_get`` — a per-chunk synchronous read stalls the dispatch
    queue on every round trip, which over a remote-execution tunnel
    (~5 ms/read) costs more than the chunk's device time at reference
    scale (~74k chunks).  Row outputs are [3, chunk_q, S] f32 — ~KBs.

    ``resume_dir`` makes the job restartable: outputs live in memmapped
    .npy files there and a ``rows_done`` marker advances after every
    completed row block; rerunning with the same dir skips finished rows.

    ``mesh`` (a multi-device ``jax.sharding.Mesh``) shards the source axis
    over every device: each row block becomes ONE dispatch whose local
    chunks are scanned on device, devices computing disjoint column
    stripes in parallel.
    """
    import time

    from ured_tpu.ops.dcd_pallas import pair_dcd_eligible

    q_n, s_n = queries.shape[0], sources.shape[0]
    fused = pair_dcd_eligible(queries.shape[1], sources.shape[1])
    start_row = 0
    marker = None
    if resume_dir:
        out, marker, start_row = _resume_state(resume_dir, q_n, s_n)
        if progress and start_row:
            print(f"pair job: resuming at row {start_row}", flush=True)
    else:
        out = {k: np.zeros((q_n, s_n), np.float32)
               for k in ("dcd", "cd_s", "cd_m")}

    sharded = mesh is not None and mesh.devices.size > 1
    if sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        stripe = chunk_s * n_dev
        s_pad = -(-s_n // stripe) * stripe
        src_host = np.zeros((s_pad,) + sources.shape[1:], sources.dtype)
        src_host[:s_n] = sources
        src_dev = jax.device_put(
            src_host, NamedSharding(mesh, P(tuple(mesh.axis_names))))
        row_fn = _make_sharded_row_fn(mesh, chunk_q, chunk_s, alpha, fused)
    else:
        src_dev = jnp.asarray(sources)
    n_rows = (q_n + chunk_q - 1) // chunk_q
    t0 = time.monotonic()
    next_report = t0 + 60.0
    for row, i in enumerate(range(0, q_n, chunk_q)):
        if row < start_row:
            continue
        qi = jnp.asarray(queries[i:i + chunk_q])
        pad_q = chunk_q - qi.shape[0]
        if pad_q:
            qi = jnp.pad(qi, ((0, pad_q), (0, 0), (0, 0)))
        bq = chunk_q - pad_q
        if sharded:
            block = np.asarray(row_fn(qi, src_dev))   # [3, chunk_q, s_pad]
            for k, ki in (("dcd", 0), ("cd_s", 1), ("cd_m", 2)):
                out[k][i:i + bq] = block[ki, :bq, :s_n]
        else:
            row_dev = []
            for j in range(0, s_n, chunk_s):
                sj = src_dev[j:j + chunk_s]
                pad_s = chunk_s - sj.shape[0]
                if pad_s:
                    sj = jnp.pad(sj, ((0, pad_s), (0, 0), (0, 0)))
                row_dev.append(_pair_chunk(qi, sj, alpha=alpha, fused=fused))
            # one batched transfer per row
            row_host = jax.device_get(row_dev)
            for (dcd, cd_s, cd_m), j in zip(row_host,
                                            range(0, s_n, chunk_s)):
                bs = min(chunk_s, s_n - j)
                out["dcd"][i:i + bq, j:j + bs] = dcd[:bq, :bs]
                out["cd_s"][i:i + bq, j:j + bs] = cd_s[:bq, :bs]
                out["cd_m"][i:i + bq, j:j + bs] = cd_m[:bq, :bs]
        if marker is not None:
            # flush the row block's dirty memmap pages to disk BEFORE
            # advancing the marker — a crash between the two must never
            # leave the marker claiming rows whose data was lost
            for m in out.values():
                m.flush()
            _mark_rows(marker, row + 1)
        now = time.monotonic()
        if progress and now >= next_report:
            done = row + 1
            eta = (now - t0) / (done - start_row) * (n_rows - done)
            print(f"pair job: row {done}/{n_rows} "
                  f"({100.0 * done / n_rows:.0f}%, eta {eta / 60.0:.1f} min)",
                  flush=True)
            next_report = now + 60.0
    if resume_dir:
        # hand back plain arrays; the memmaps (and marker) stay on disk for
        # the caller to clean up after persisting the final archive
        out = {k: np.asarray(v) for k, v in out.items()}
    return out


def source_pair_matrix(sources: np.ndarray, chunk: int = 32,
                       alpha: float = 1000.0,
                       chunk_q: Optional[int] = None,
                       resume_dir: Optional[str] = None,
                       mesh=None) -> np.ndarray:
    """Symmetric source-to-source cd_m matrix (reference ``get_src_pair``;
    consumed as ``dist_src`` by the similarity mask).

    Pass the archive job's ``chunk_q`` to reuse its compiled chunk shape —
    a fresh (chunk_q, chunk_s) shape costs a full kernel compile (~200 s
    over remote-compile backends)."""
    d = pair_distance_matrix(sources, sources,
                             chunk_q if chunk_q is not None else chunk,
                             chunk, alpha, resume_dir=resume_dir,
                             mesh=mesh)["cd_m"]
    return (d + d.T) / 2.0


def _mutual_similarity_mask(selected: np.ndarray, dist_src: np.ndarray,
                            cl_k: int) -> np.ndarray:
    """True for parts whose selected source is mutually within the top-cl_k
    of an *earlier* part's selection (reference ``mask_label:1077-1086`` /
    ``check_similarity:1070-1075``)."""
    k = len(selected)
    masked = np.zeros(k, bool)
    if dist_src is None:
        return masked
    ranks = {}
    for lab in set(int(x) for x in selected):
        kk = min(cl_k, dist_src.shape[1] - 1)
        ranks[lab] = set(np.argpartition(dist_src[lab], kk)[:kk].tolist())
    for i in range(k):
        for j in range(i + 1, k):
            a, b = int(selected[i]), int(selected[j])
            if a in ranks[b] and b in ranks[a]:
                masked[j] = True
    return masked


def build_label_table(cd_m: np.ndarray, part_valid: np.ndarray,
                      part_sems: np.ndarray, source_sems: np.ndarray,
                      threshold: float, dist_src: Optional[np.ndarray],
                      cl_k: int, topk: int = 10) -> np.ndarray:
    """Pseudo-label selection for every (target, part).

    Args:
      cd_m: [T, P, S] part-to-source distances.
      part_valid: [T, P] 1 where the target has the part.
      part_sems: [T, P] semantic class per part.
      source_sems: [S] semantic class per source.
      threshold: distance filter (cfg.filter_threshold).
      dist_src: [S, S] source pairwise distances for similarity masking.
      cl_k: similarity-mask neighborhood size (cfg.cl_k).
    Returns:
      [T, P] int64 source index, -1 for absent or masked parts.
    """
    t, p, s = cd_m.shape
    k = min(topk, s)

    # --- vectorized selection over all (target, part) rows at once ---
    # top-k by distance (argpartition + sort of the k candidates only):
    # O(T*P*S) instead of the per-row argsort's O(T*P*S log S) python loop
    if k < s:
        cand = np.argpartition(cd_m, kth=k - 1, axis=-1)[..., :k]
    else:
        cand = np.broadcast_to(np.arange(s), cd_m.shape).copy()
    cand_d = np.take_along_axis(cd_m, cand, axis=-1)
    order = np.argsort(cand_d, axis=-1, kind="stable")
    topk_idx = np.take_along_axis(cand, order, axis=-1)    # [T, P, k] sorted
    topk_d = np.take_along_axis(cand_d, order, axis=-1)

    close = topk_d < threshold                              # [T, P, k]
    sem_ok = np.asarray(source_sems)[topk_idx] == \
        np.asarray(part_sems)[..., None]
    prio = close & sem_ok
    # pick priority: first close-with-matching-semantic, else first close,
    # else the nearest source (reference get_labels:1118-1137)
    first_prio = np.argmax(prio, axis=-1)
    first_close = np.argmax(close, axis=-1)
    sel_pos = np.where(prio.any(-1), first_prio,
                       np.where(close.any(-1), first_close, 0))
    pick = np.take_along_axis(topk_idx, sel_pos[..., None], -1)[..., 0]

    # --- order-dependent mutual-similarity masking stays per target
    # (earlier parts win; <= P elements each, reference mask_label:1077) ---
    table = np.full((t, p), -1, np.int64)
    for ti in range(t):
        slots = np.where(part_valid[ti] > 0)[0]
        if slots.size == 0:
            continue
        chosen = pick[ti, slots]
        masked = _mutual_similarity_mask(chosen, dist_src, cl_k)
        table[ti, slots] = np.where(masked, -1, chosen)
    return table


def save_pair_archive(path: str, matrices: Dict[str, np.ndarray]) -> None:
    """One npz instead of the reference's pickle-per-part.  Uncompressed:
    f32 distance matrices barely compress, and zlib over the reference-scale
    2.4 GB archive costs ~10 host-minutes on one core."""
    np.savez(path, **matrices)


def load_pair_archive(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def main(argv):
    """``python -m ured_tpu.data.pairs config.json`` — the role of reference
    ``engine/generate_pair.py``: build the target-part x source DCD/CD
    distance matrices (the retrieval pseudo-GT) as one batched on-device
    job and save the pair archive next to the data."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data import corpus

    cfg = URedConfig.from_json(argv[1]) if len(argv) > 1 else URedConfig()
    if not corpus.real_data_available(cfg):
        print("no PartNet-layout tree at the configured paths; nothing to do")
        return
    cls = corpus.dataset_class(cfg)
    dataset = cls.from_h5(cfg)
    from ured_tpu.data.partnet import load_sources

    source_db = load_sources(cfg)
    path = str(cfg.extras.get("pair_archive",
                              corpus.pair_archive_path(cfg)))
    from ured_tpu.parallel.mesh import resolve_mesh

    archive = corpus.build_pair_archive(
        cfg, dataset.points, dataset.labels, source_db.points,
        cache_path=path, device_mesh=resolve_mesh(cfg))
    print(f"pair archive: {path} "
          f"({ {k: tuple(v.shape) for k, v in archive.items()} })")


if __name__ == "__main__":
    import sys

    main(sys.argv)


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)
