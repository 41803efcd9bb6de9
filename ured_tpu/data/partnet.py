"""PartNet / StructureNet dataset and source-database loading.

Reference parity: ``dataset/partnet_dataset.py`` (target h5 + occlusion +
recenter + small random rotation) and ``train_utils/load_sources.py`` (the
in-RAM source-part database).  Differences by design:

  * The source DB is loaded into **stacked fixed-shape arrays** (points
    [S, n, 3], A-matrices [S, 3n, 6], ...), not a list of python dicts, so
    batch gathers are one device ``take`` instead of per-sample loops.
  * Pseudo-labels come from a precomputed ``label_table`` [T, P] built once
    by ``ured_tpu.data.pairs`` — replacing the per-step pickle/JSON reads of
    ``dataset_utils.py:get_labels:1101-1143`` (the reference's own hot-loop
    bottleneck, SURVEY.md §3.1).
  * Occlusion/rotation run on device (``ured_tpu.data.occlusion``); this
    loader only hands out raw fixed-shape host arrays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.data import io
from ured_tpu.data.vocab import label_id


@dataclass
class SourceDB:
    """Stacked source-part database."""

    points: np.ndarray          # [S, n, 3]
    mats: np.ndarray            # [S, 3n, 6]
    default_params: np.ndarray  # [S, 6]
    sem_ids: np.ndarray         # [S] int
    sem_labels: List[str]       # [S]
    model_ids: List[str]        # [S]
    # optional mesh payloads (ragged; kept as lists for the vis/export path)
    vertices: Optional[List[np.ndarray]] = None
    vertices_mats: Optional[List[np.ndarray]] = None
    faces: Optional[List[np.ndarray]] = None
    dist_src: Optional[np.ndarray] = None  # [S, S] pairwise distances
    # whole-shape joint constraints (loaded under ``cfg.use_connectivity``,
    # reference ``load_sources.py:102-122``): per row, the OWNING shape's
    # C [3J, 6K] / null-space projector [6K, 6K] and this part's block index
    constraint_mats: Optional[List[Optional[np.ndarray]]] = None
    constraint_projs: Optional[List[Optional[np.ndarray]]] = None
    part_indices: Optional[np.ndarray] = None  # [S] int, -1 when unknown

    def __len__(self) -> int:
        return self.points.shape[0]


def targets_h5_path(cfg: URedConfig) -> str:
    return os.path.join(
        cfg.base_dir, "generated_datasplits",
        f"{cfg.category}_{cfg.num_source}_{cfg.mode}.h5")


def shapenet_targets_h5_path(cfg: URedConfig) -> str:
    """ShapeNet/ComplementMe layout (reference
    ``dataset/shapenet_dataset.py:16-25``): the datasplit directory is
    doubled around ``middle_name`` and switches to the ``_complementme``
    variant for ComplementMe data."""
    split_dir = ("generated_datasplits_complementme" if cfg.complementme
                 else "generated_datasplits")
    return os.path.join(
        cfg.base_dir, split_dir, cfg.middle_name, split_dir,
        f"{cfg.category}_{cfg.num_source}_{cfg.mode}.h5")


def datasplits_path(cfg: URedConfig) -> str:
    return os.path.join(
        cfg.base_dir, "generated_datasplits",
        f"{cfg.category}_{cfg.num_source}.pickle")


def source_h5_dir(cfg: URedConfig) -> str:
    return os.path.join(cfg.base_dir, cfg.data_dir, cfg.category, "h5")


def load_sources(cfg: URedConfig, mesh: bool = False,
                 h5_dir: Optional[str] = None,
                 source_names: Optional[List[str]] = None) -> SourceDB:
    """Load the source-part database into stacked arrays.

    ``source_names`` defaults to the datasplit pickle's source list
    (reference ``load_sources.py:15-17``).
    """
    h5_dir = h5_dir or source_h5_dir(cfg)
    dedup = None
    if source_names is None:
        sources, _, _ = io.load_datasplits(datasplits_path(cfg))
        source_names = [str(s) for s in sources]
        # spectral-dedup filtering (the reference's live consumption of
        # simple_cl's results.pickle: ``generate_pair.py:58`` subsets the
        # source list to the cluster representatives).  The ``dedup_index``
        # extra is a pickle path, or ``true`` for base_dir/dedup_index.pickle
        # (the ``data.clustering`` CLI's output location).
        dd = cfg.extras.get("dedup_index")
        if dd:
            from ured_tpu.data.clustering import load_dedup_index

            dd_path = dd if isinstance(dd, str) else os.path.join(
                cfg.base_dir, "dedup_index.pickle")
            dedup = np.sort(load_dedup_index(dd_path).astype(np.int64))
            source_names = [source_names[i] for i in dedup]

    pts, mats, defaults, sem_ids, sem_labels, model_ids = \
        [], [], [], [], [], []
    verts, vmats, faces = [], [], []
    cmats, cprojs, pidx = [], [], []
    use_conn = bool(cfg.use_connectivity)
    for name in source_names:
        path = name if os.path.isabs(name) else os.path.join(h5_dir, name)
        if not path.endswith(".h5"):
            path += ".h5"
        part = io.load_part_h5(path, mesh=mesh, constraint=use_conn)
        pts.append(part.points.astype(np.float32))
        mats.append(part.points_mat.astype(np.float32))
        defaults.append(part.default_param.astype(np.float32))
        sem_labels.append(part.sem_label)
        sem_ids.append(label_id(part.sem_label))
        model_ids.append(part.model_id)
        if mesh:
            verts.append(part.vertices)
            vmats.append(part.vertices_mat)
            faces.append(part.faces)
        if use_conn:
            cmats.append(part.constraint_mat)
            cprojs.append(part.constraint_proj)
            pidx.append(part.part_index)

    dist_src = None
    if cfg.src_connectivity and os.path.exists(cfg.src_connectivity):
        dist_src = np.load(cfg.src_connectivity)
        if dedup is not None and dist_src.shape[0] > len(source_names):
            # the precomputed [S, S] matrix covers the FULL source set;
            # restrict it to the representatives
            dist_src = dist_src[np.ix_(dedup, dedup)]

    return SourceDB(
        points=np.stack(pts),
        mats=np.stack(mats),
        default_params=np.stack(defaults),
        sem_ids=np.asarray(sem_ids, np.int32),
        sem_labels=sem_labels,
        model_ids=model_ids,
        vertices=verts if mesh else None,
        vertices_mats=vmats if mesh else None,
        faces=faces if mesh else None,
        dist_src=dist_src,
        constraint_mats=cmats if use_conn else None,
        constraint_projs=cprojs if use_conn else None,
        part_indices=np.asarray(pidx, np.int64) if use_conn else None)


@dataclass
class PartNetDataset:
    """Target corpus with fixed-shape arrays + batch iteration."""

    # the reference's PartNet loader pins the occlusion generator to the
    # kNN-ball variant (``partnet_dataset.py:50``: choose_one_occ = 0)
    default_occlusion = "ball"

    cfg: URedConfig
    points: np.ndarray       # [T, N, 3]
    labels: np.ndarray       # [T, N] int part id
    semantics: np.ndarray    # [T, N] int semantic embedding id
    model_ids: np.ndarray    # [T]
    label_table: Optional[np.ndarray] = None  # [T, P] pseudo-labels

    @classmethod
    def from_h5(cls, cfg: URedConfig,
                path: Optional[str] = None) -> "PartNetDataset":
        path = path or targets_h5_path(cfg)
        data, label, semantic, model_id = io.load_targets_h5(path)
        pts = data.astype(np.float32)
        if cfg.complementme:
            # ComplementMe data is mirrored on z (reference train.py:192-194)
            pts = pts.copy()
            pts[:, :, 2] = -pts[:, :, 2]
        return cls(cfg=cfg, points=pts,
                   labels=label.astype(np.int32),
                   semantics=semantic.astype(np.int32),
                   model_ids=model_id)

    def __len__(self) -> int:
        return self.points.shape[0]

    def attach_label_table(self, table: np.ndarray) -> None:
        assert table.shape == (len(self), self.cfg.MAX_NUM_PARTS)
        self.label_table = table

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True, drop_last: bool = True
                ) -> Iterator[Dict[str, np.ndarray]]:
        order = rng.permutation(len(self)) if shuffle \
            else np.arange(len(self))
        stop = len(self) - (len(self) % batch_size if drop_last else 0)
        for i in range(0, stop, batch_size):
            idx = order[i:i + batch_size]
            if len(idx) < batch_size and drop_last:
                break
            yield self.make_batch(idx)

    def make_batch(self, idx: np.ndarray,
                   source_db: Optional[SourceDB] = None
                   ) -> Dict[str, np.ndarray]:
        batch = {
            "x": self.points[idx],
            "labels": self.labels[idx],
            "tgt_sem": self.semantics[idx],
            "model_ids": self.model_ids[idx],
        }
        if self.label_table is not None and source_db is not None:
            lt = self.label_table[idx]
            safe = np.where(lt >= 0, lt, 0)
            batch.update({
                "src_points": source_db.points[safe],
                "src_sem": source_db.sem_ids[safe].astype(np.int32),
                "src_mat": source_db.mats[safe],
                "src_valid": (lt >= 0).astype(np.float32),
            })
        return batch


@dataclass
class ShapeNetDataset(PartNetDataset):
    """ShapeNet / ComplementMe variant (reference
    ``dataset/shapenet_dataset.py:14-114``).  Differences from PartNet:

      * h5 path uses the nested ``middle_name`` datasplit layout (and the
        ``generated_datasplits_complementme`` directory for ComplementMe)
        — see ``shapenet_targets_h5_path``;
      * the occlusion choice is the real random 30/30/30/10
        ball/random/slice/part mixture (``:50-58``), here the on-device
        ``occlusion.occlude(mode='mixed')``;
      * per-point labels/semantics ride the occlusion mask gather
        (``:83``: ``labels[points_occ_mask]``), which
        ``engine.train.make_augment_fn`` applies via the kept-index gather.
    """

    default_occlusion = "mixed"

    @classmethod
    def from_h5(cls, cfg: URedConfig,
                path: Optional[str] = None) -> "ShapeNetDataset":
        return super().from_h5(cfg, path or shapenet_targets_h5_path(cfg))
