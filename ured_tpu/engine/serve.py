"""Production inference serving for retrieval + deformation.

The reference has no serving surface — its closest path is the ``vis.py``
batch loop (``vis.py:153-299``).  This module packages the flagship
inference (encode target -> retrieve over the source DB -> decode per-part
deformation params -> assemble the deformed shape) as:

  * :class:`InferenceSession` — device-resident encoded source DB + a
    jitted fixed-shape predict step with request padding, ready to sit
    behind a request loop;
  * AOT export via ``jax.export`` — a serialized StableHLO artifact with
    the weights and the encoded DB baked in as constants, reloadable on a
    serving host that has only jax + the artifact (no model code);
  * a CLI: ``python -m ured_tpu.engine.serve cfg.json [requests.npz]
    [out.npz] [--artifact art.bin]``.

The predict step reuses :func:`ured_tpu.engine.evaluate.make_eval_step`
(the eval contract of reference ``test.py:146-283``), so serving and eval
can never drift.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.models.ured import URED

# the lean serving payload (the eval step also returns ranking tensors the
# host metric loop consumes; a serving response doesn't need them)
SERVE_KEYS = ("top1", "params", "deformed", "cd_full", "re_score",
              "part_mask", "param_def")


class InferenceSession:
    """Batched retrieval+deformation inference over a fixed source DB.

    Requests are (points [N, 3], labels [N], tgt_sem [N]) triples — the
    reference's target inputs (``partnet_dataset.py:86``); the session pads
    any request count to the fixed batch shape, runs the jitted step, and
    unpads.  One session = one compiled program; ``warmup()`` pays the
    compile before the first request.
    """

    def __init__(self, cfg: URedConfig, model: URED, variables,
                 src_db: Dict[str, jax.Array], batch_size: int = 16,
                 k_candidates: int = 1, mesh=None,
                 response_keys=None, response_dtype=None):
        from ured_tpu.engine.evaluate import make_eval_step

        self.cfg = cfg
        self.model = model
        self.batch_size = int(batch_size)
        # response projection: on network-attached accelerators the
        # response TRANSFER (~6 MB of deformed geometry per batch) dominates
        # the ~12 ms device step, so a deployment that only needs retrieval
        # ids + params can project the payload down and/or downcast floats
        # ON DEVICE before the wire (cfg extras serve_response_keys /
        # serve_response_dtype through from_config)
        if response_keys is not None:
            unknown = set(response_keys) - set(SERVE_KEYS)
            if unknown:
                raise ValueError(f"unknown response keys {sorted(unknown)}; "
                                 f"valid: {SERVE_KEYS}")
        self.response_keys = tuple(response_keys or SERVE_KEYS)
        self.response_dtype = (jnp.dtype(response_dtype)
                               if response_dtype is not None else None)
        self.num_points = int(cfg.num_target_points)
        s_real = int(src_db["codes"].shape[0])
        self._dp_sharding = None
        if mesh is not None:
            # same placement as evaluate(): DB sharded over db, weights
            # replicated, request batches sharded over dp
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ured_tpu.engine.evaluate import place_source_db

            if self.batch_size % mesh.shape["dp"]:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by "
                    f"mesh_dp={mesh.shape['dp']}")
            src_db = place_source_db(src_db, mesh)
            variables = jax.device_put(variables,
                                       NamedSharding(mesh, P()))
            self._dp_sharding = NamedSharding(mesh, P("dp"))
        self.variables = variables
        self.src_db = src_db
        step = make_eval_step(cfg, model, k_candidates=k_candidates,
                              mesh=mesh, num_real_sources=s_real)

        keys, rdtype = self.response_keys, self.response_dtype

        def serve_step(variables, batch, src_db):
            out = step(variables, batch, src_db)
            out = {k: out[k] for k in keys}
            if rdtype is not None:
                out = {k: v.astype(rdtype)
                       if jnp.issubdtype(v.dtype, jnp.floating) else v
                       for k, v in out.items()}
            return out

        self._serve_step = serve_step
        self._step = jax.jit(serve_step)

    @classmethod
    def from_config(cls, cfg: URedConfig, data=None,
                    batch_size: Optional[int] = None,
                    k_candidates: int = 1, mesh=None) -> "InferenceSession":
        """Build the session the way the evaluate CLI does: resolve the
        corpus, restore the checkpoint groups, encode the source DB.

        Consumes the cfg extras ``serve_response_keys`` (list of
        ``SERVE_KEYS`` names) and ``serve_response_dtype`` (e.g.
        ``"bfloat16"``) for the response projection.
        """
        from ured_tpu.engine.evaluate import (build_source_db,
                                              restore_eval_variables)
        from ured_tpu.engine.train import resolve_corpus

        if data is None:
            data = resolve_corpus(cfg)
        bs = batch_size or cfg.batch_size
        model, variables = restore_eval_variables(cfg, data, batch_size=bs)
        src_db = build_source_db(
            cfg, model, variables, jnp.asarray(data.src_points),
            jnp.asarray(data.src_sems), jnp.asarray(data.src_mats))
        return cls(cfg, model, variables, src_db, batch_size=bs,
                   k_candidates=k_candidates, mesh=mesh,
                   response_keys=cfg.extras.get("serve_response_keys"),
                   response_dtype=cfg.extras.get("serve_response_dtype"))

    def _batch(self, points, labels, tgt_sem):
        b = {"x": jnp.asarray(points, jnp.float32),
             "labels": jnp.asarray(labels, jnp.int32),
             "tgt_sem": jnp.asarray(tgt_sem, jnp.int32)}
        if self._dp_sharding is not None:
            b = {k: jax.device_put(v, self._dp_sharding)
                 for k, v in b.items()}
        return b

    def warmup(self) -> None:
        """Compile the serving program on a dummy batch."""
        n = self.num_points
        z = self._batch(np.zeros((self.batch_size, n, 3), np.float32),
                        np.zeros((self.batch_size, n), np.int32),
                        np.zeros((self.batch_size, n), np.int32))
        jax.block_until_ready(
            self._step(self.variables, z, self.src_db))

    def predict(self, points: np.ndarray, labels: np.ndarray,
                tgt_sem: np.ndarray) -> Dict[str, np.ndarray]:
        """Serve a request of any count: [R, N, 3] (or a single [N, 3]).

        Pads R up to a multiple of the session batch size with repeats of
        the last row, runs the fixed-shape program per batch, unpads, and
        returns host arrays keyed by ``SERVE_KEYS``.
        """
        points = np.asarray(points, np.float32)
        single = points.ndim == 2
        if single:
            points, labels, tgt_sem = (points[None],
                                       np.asarray(labels)[None],
                                       np.asarray(tgt_sem)[None])
        labels = np.asarray(labels)
        tgt_sem = np.asarray(tgt_sem)
        r = points.shape[0]
        if r == 0:
            raise ValueError("empty request: predict() needs >= 1 cloud")
        bs = self.batch_size
        pad = (-r) % bs
        if pad:
            points = np.concatenate([points, points[-1:].repeat(pad, 0)])
            labels = np.concatenate([labels, labels[-1:].repeat(pad, 0)])
            tgt_sem = np.concatenate([tgt_sem, tgt_sem[-1:].repeat(pad, 0)])
        outs = []
        for i in range(0, points.shape[0], bs):
            batch = self._batch(points[i:i + bs], labels[i:i + bs],
                                tgt_sem[i:i + bs])
            outs.append(jax.device_get(
                self._step(self.variables, batch, self.src_db)))
        merged = {k: np.concatenate([o[k] for o in outs])[:r]
                  for k in self.response_keys if np.ndim(outs[0][k]) > 0}
        if single:
            merged = {k: v[0] for k, v in merged.items()}
        return merged

    def predict_unlabeled(self, points: np.ndarray,
                          sem_label: Optional[str] = None
                          ) -> Dict[str, np.ndarray]:
        """Serve label-free clouds (e.g. ROCA scan detections,
        ``data/roca.py``): the whole cloud is treated as one part (label 0)
        with a single semantic id (``sem_label`` through the vocabulary,
        default the config category) — whole-object retrieval+deformation,
        the mode the reference's ROCA targets imply (its dataset yields
        points only, ``ROCA_dataset.py:84-153``)."""
        from ured_tpu.data.vocab import label_id

        pts = np.asarray(points, np.float32)
        shape = pts.shape[:-1] if pts.ndim == 2 else pts.shape[:2]
        labels = np.zeros(shape, np.int32)
        sem = np.full(shape, label_id(sem_label or self.cfg.category),
                      np.int32)
        return self.predict(pts, labels, sem)

    # ---- AOT artifact -----------------------------------------------------

    def export_artifact(self, platforms=("cpu", "tpu")) -> bytes:
        """Serialize the serving program to a StableHLO artifact.

        Weights and the encoded source DB are baked in as constants: the
        artifact is self-contained (a serving host needs jax + these bytes,
        not the model code).  Artifact size therefore scales with the DB —
        export against a deduplicated DB for deployment.  ``platforms``
        lowers for several backends at once, so an artifact exported on a
        CPU dev box serves on TPU and vice versa.
        """
        from jax import export as jexport

        if self._dp_sharding is not None:
            raise ValueError(
                "export_artifact requires a single-device session: build "
                "the InferenceSession without a mesh for export, and shard "
                "at load time on the serving host instead")
        variables, src_db = self.variables, self.src_db

        def art_fn(batch):
            return self._serve_step(variables, batch, src_db)

        n = self.num_points
        spec = {"x": jax.ShapeDtypeStruct((self.batch_size, n, 3),
                                          jnp.float32),
                "labels": jax.ShapeDtypeStruct((self.batch_size, n),
                                               jnp.int32),
                "tgt_sem": jax.ShapeDtypeStruct((self.batch_size, n),
                                                jnp.int32)}
        exported = jexport.export(jax.jit(art_fn),
                                  platforms=tuple(platforms))(spec)
        return bytes(exported.serialize())


def load_artifact(data: bytes):
    """Reload a serialized serving artifact -> callable(batch) -> outputs."""
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(data))
    return exported.call


def main(argv):
    """CLI: ``python -m ured_tpu.engine.serve cfg.json [requests.npz]
    [out.npz] [--artifact path]``.

    ``requests.npz`` holds points [R, N, 3], labels [R, N], tgt_sem [R, N];
    without it, the first corpus targets are served as a smoke request.
    ``--artifact`` additionally writes the AOT StableHLO artifact.
    """
    import argparse

    ap = argparse.ArgumentParser(prog="ured-serve")
    ap.add_argument("config", nargs="?", help="config JSON")
    ap.add_argument("requests", nargs="?",
                    help="requests .npz (points/labels/tgt_sem)")
    ap.add_argument("out", nargs="?", default="serve_out.npz")
    ap.add_argument("--artifact", help="also write the AOT artifact here")
    ns = ap.parse_args(argv[1:])
    artifact_path = ns.artifact

    cfg = URedConfig.from_json(ns.config) if ns.config \
        else URedConfig(batch_size=8)
    cfg.extras.setdefault("synthetic_targets", 32)
    # resolve the corpus ONCE: the session needs it for the source DB and
    # the smoke request reuses the same object (no double resolve)
    from ured_tpu.engine.train import resolve_corpus

    data = resolve_corpus(cfg)
    session = InferenceSession.from_config(
        cfg, data=data, k_candidates=int(cfg.extras.get("k_candidates", 1)))

    if ns.requests:
        req = np.load(ns.requests)
        points, labels, tgt_sem = (req["points"], req["labels"],
                                   req["tgt_sem"])
    else:
        batch = data.make_batch(np.arange(min(4, len(data))))
        points, labels, tgt_sem = (batch["x"], batch["labels"],
                                   batch["tgt_sem"])

    out = session.predict(points, labels, tgt_sem)
    cd = out.get("cd_full")  # may be projected out by serve_response_keys
    print(f"served {np.asarray(points).shape[0]} requests" +
          (f": mean cd {float(np.mean(cd)):.6f}" if cd is not None else ""))

    out_path = ns.out
    np.savez(out_path, **out)
    print(f"responses written to {out_path}")

    if artifact_path:
        blob = session.export_artifact()
        with open(artifact_path, "wb") as f:
            f.write(blob)
        print(f"AOT artifact ({len(blob)} bytes) written to {artifact_path}")
    return out


if __name__ == "__main__":
    import sys

    main(sys.argv)


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)
