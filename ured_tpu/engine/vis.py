"""Retrieval + deformation visualization pipeline (the reference's working
eval path, ``engine/vis.py``): per-corpus cosine retrieval with NDCG@40,
deformation of retrieved source *meshes*, and OBJ export — plus the
retrieval-QA sweep of ``engine/visualization.py`` (collect each query's
top-k retrieved parts and count semantic mismatches).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.engine.evaluate import build_source_db, make_eval_step
from ured_tpu.engine.export import export_deformed_assembly
from ured_tpu.models.ured import URED


def run_vis(cfg: URedConfig, model: URED, variables, data, source_db,
            out_dir: str, max_targets: Optional[int] = None,
            alpha: Optional[float] = None, mesh=None) -> Dict[str, float]:
    """Evaluate + export deformed meshes for each target.

    ``data``: PartNetDataset or SyntheticData-like (points/labels/semantics
    arrays).  ``source_db``: ``partnet.SourceDB`` with mesh payloads, or a
    dict with points/mats (points-only export then).

    ``mesh`` (default: resolved from ``cfg.mesh_dp`` x ``cfg.mesh_db``):
    batch dp-sharded, source DB sharded over ``db``, retrieval through
    ``sharded_retrieve_topk`` — same multi-chip path as ``evaluate()``.

    Returns the metric dict; writes per-target OBJ assemblies to
    ``out_dir`` (reference ``vis.py:270-299``).
    """
    os.makedirs(out_dir, exist_ok=True)
    alpha = cfg.alpha if alpha is None else alpha
    bs = cfg.batch_size
    if mesh is None:
        from ured_tpu.parallel.mesh import resolve_mesh

        mesh = resolve_mesh(cfg)
    n = data.points.shape[0] if max_targets is None \
        else min(max_targets, data.points.shape[0])
    # small corpora: shrink the batch (dp-evenly) rather than index past
    # the end or produce zero drop-remainder batches
    from ured_tpu.engine.evaluate import _fit_batch_size

    bs = _fit_batch_size(bs, n, mesh)
    n = (n // bs) * bs

    # SourceDB uses points/mats/sem_ids; SyntheticData uses src_* names
    # (its plain points/labels are the *targets*)
    if hasattr(source_db, "src_points"):
        src_points = jnp.asarray(source_db.src_points)
        src_sems = jnp.asarray(source_db.src_sems)
        src_mats = jnp.asarray(source_db.src_mats)
    else:
        src_points = jnp.asarray(source_db.points)
        src_sems = jnp.asarray(source_db.sem_ids)
        src_mats = jnp.asarray(source_db.mats)

    db = build_source_db(cfg, model, variables, src_points, src_sems,
                         src_mats)
    from ured_tpu.engine.evaluate import (
        eval_batches,
        maybe_recalibrate,
        ndcg_for_batch,
    )

    variables, db = maybe_recalibrate(cfg, model, variables, data, db,
                                      bs, n)
    dp_sharding = None
    s_real = db["codes"].shape[0]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ured_tpu.engine.evaluate import place_source_db

        db = place_source_db(db, mesh)
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        dp_sharding = NamedSharding(mesh, P("dp"))
    step = jax.jit(make_eval_step(cfg, model, mesh=mesh,
                                  num_real_sources=s_real))

    ndcg_sigma = float(cfg.extras.get("ndcg_sigma", 0.001))
    pair_dist = getattr(data, "pair_dist", None)

    cds, res, ndcgs = [], [], []
    for i, batch in eval_batches(data, bs, n):
        if dp_sharding is not None:
            batch = {k: jax.device_put(v, dp_sharding)
                     for k, v in batch.items()}
        out = step(variables, batch, db)
        cds.append(np.asarray(out["cd_full"]))
        res.append(np.asarray(out["re_score"]))
        if pair_dist is not None:
            # NDCG@40 vs DCD relevance, like the reference vis loop
            ndcgs.extend(ndcg_for_batch(out, pair_dist, i, ndcg_sigma))

        top1 = np.asarray(out["top1"])
        params = np.asarray(out["params"])
        param_def = np.asarray(out["param_def"])
        mask = np.asarray(out["part_mask"])
        has_mesh = getattr(source_db, "vertices_mats", None)
        # cfg.use_connectivity: parts co-retrieved from the same source
        # shape are deformed with their joints welded (whole-shape
        # constraint projection, reference ``use_connectivity`` configs)
        conn = getattr(source_db, "constraint_mats", None) \
            if cfg.use_connectivity else None
        for b in range(top1.shape[0]):
            t = i + b
            if has_mesh:
                sel = top1[b]
                vmats = [source_db.vertices_mats[s] for s in sel]
                faces = [source_db.faces[s] for s in sel]
                kw = {}
                if conn is not None:
                    kw = dict(
                        shape_keys=[source_db.model_ids[s].rsplit("_", 1)[0]
                                    for s in sel],
                        constraint_mats=[conn[s] for s in sel],
                        part_indices=[int(source_db.part_indices[s])
                                      for s in sel])
                export_deformed_assembly(
                    out_dir, f"target{t:04d}", vmats, faces, params[b],
                    param_def[b], alpha=alpha, part_mask=mask[b], **kw)
            else:
                # points-only export path
                from ured_tpu.engine.export import export_point_cloud

                deformed = np.asarray(out["deformed"][b]).reshape(-1, 3)
                labels = np.repeat(np.arange(mask.shape[1]),
                                   out["deformed"].shape[2])
                keep = np.repeat(mask[b] > 0, out["deformed"].shape[2])
                export_point_cloud(out_dir, f"target{t:04d}",
                                   deformed[keep], labels[keep])

    metrics = {
        "best_full_cd_loss": float(np.mean(np.concatenate(cds))),
        "best_full_re_loss": float(np.mean(np.concatenate(res))),
    }
    if ndcgs:
        metrics["ndcg@40"] = float(np.mean(ndcgs))
    print("vis: best full cd loss {:.6f} | best full re loss {:.6f}{}".format(
        metrics["best_full_cd_loss"], metrics["best_full_re_loss"],
        " | ndcg@40 {:.4f}".format(metrics["ndcg@40"])
        if "ndcg@40" in metrics else ""))
    return metrics


def retrieval_qa(top_idx: np.ndarray, query_sems: np.ndarray,
                 source_sems: np.ndarray,
                 k: int = 5) -> Dict[str, float]:
    """Semantic-mismatch QA over retrieval results (the role of reference
    ``engine/visualization.py:check_sources_connect_single:70-96`` without
    the file copying): fraction of top-k retrievals whose semantic class
    disagrees with the query part's."""
    top = top_idx[:, :k]
    retrieved_sems = source_sems[top]                     # [Q, k]
    mismatch = retrieved_sems != query_sems[:, None]
    return {
        "topk_semantic_mismatch_rate": float(mismatch.mean()),
        "top1_semantic_mismatch_rate": float(mismatch[:, 0].mean()),
        "queries": int(top.shape[0]),
    }


def main(argv):
    """``python -m ured_tpu.engine.vis [config.json] [out_dir]`` — the role
    of reference ``engine/vis.py``: load checkpoint, retrieve + deform every
    target, export per-target OBJ/PLY assemblies, print the metric pair.
    PartNet-layout data (with source meshes) when the config points at it;
    synthetic corpus fallback (points-only export)."""
    cfg = URedConfig.from_json(argv[1]) if len(argv) > 1 else URedConfig(
        batch_size=8)
    out_dir = argv[2] if len(argv) > 2 else cfg.log_path + "/vis"
    cfg.extras.setdefault("synthetic_targets", 16)

    from ured_tpu.engine.evaluate import restore_eval_variables
    from ured_tpu.engine.train import resolve_corpus

    data = resolve_corpus(cfg, mesh=True)  # meshes for OBJ export
    source_db = data.source_db if data.source_db is not None else data
    model, variables = restore_eval_variables(cfg, data)
    if data.extras.get("origin") == "synthetic":
        # synthetic pair distances live on a ~0.1 scale, not DCD's 0.001
        cfg.extras.setdefault("ndcg_sigma", 0.1)
    mt = cfg.extras.get("vis_max_targets")
    return run_vis(cfg, model, variables, data, source_db, out_dir,
                   max_targets=int(mt) if mt is not None else None)


if __name__ == "__main__":
    import sys

    main(sys.argv)


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)
