"""Procedural synthetic dataset: multi-part box furniture.

The reference has no hermetic data path — every entry point needs the
preprocessed PartNet tree (SURVEY.md §4).  This module generates chair-like
shapes (seat, back, legs) as box-surface point clouds **with exact parametric
deformation models**, so the full train/eval/bench path runs without any
external data while exercising the same tensors the PartNet pipeline
produces: targets [N, 3] with part labels + semantics, a source-part database
with points / A-matrices / default params / semantic labels, and
nearest-neighbor pseudo-labels.

Semantics use three classes mapped into the reference's 42-class vocabulary
range (``engine/global_variables.py:44``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from ured_tpu.data.parametric import (
    aabbox_of_points,
    compute_param_linear_equation,
    get_default_param,
)

SEM_SEAT, SEM_BACK, SEM_LEG = 3, 4, 5  # arbitrary ids < 42
SEM_TOP, SEM_PANEL, SEM_SHELF = 6, 7, 8


def sample_box_surface(rng: np.random.Generator, n: int,
                       center: np.ndarray, half: np.ndarray) -> np.ndarray:
    """Uniform-ish points on the surface of an axis-aligned box."""
    areas = np.array([half[1] * half[2], half[0] * half[2],
                      half[0] * half[1]])
    probs = areas / areas.sum()
    face_axis = rng.choice(3, size=n, p=probs)
    face_sign = rng.choice([-1.0, 1.0], size=n)
    u = rng.uniform(-1, 1, size=(n, 3))
    pts = u * half[None, :]
    rows = np.arange(n)
    pts[rows, face_axis] = face_sign * half[face_axis]
    return pts + center[None, :]


def _table_layout(rng: np.random.Generator):
    """Random table: top + 4 legs (5 parts), the reference's second
    headline category (``config_train_table*.json``)."""
    top_w = rng.uniform(0.4, 0.7)
    top_d = rng.uniform(0.3, 0.6)
    top_t = rng.uniform(0.02, 0.06)
    leg_h = rng.uniform(0.3, 0.5)
    leg_r = rng.uniform(0.02, 0.05)
    parts = [
        (np.array([0.0, leg_h + top_t, 0.0]),
         np.array([top_w, top_t, top_d]), SEM_TOP),
    ]
    for sx in (-1, 1):
        for sz in (-1, 1):
            parts.append((
                np.array([sx * (top_w - leg_r), leg_h / 2.0,
                          sz * (top_d - leg_r)]),
                np.array([leg_r, leg_h / 2.0, leg_r]), SEM_LEG))
    return parts


def _storage_layout(rng: np.random.Generator):
    """Random storage furniture: two side panels, top, bottom, back and
    1-2 shelves (6-7 parts; the reference's cabinet/display family)."""
    w = rng.uniform(0.3, 0.5)
    h = rng.uniform(0.4, 0.7)
    d = rng.uniform(0.15, 0.3)
    t = rng.uniform(0.02, 0.05)
    parts = [
        (np.array([-w + t, h, 0.0]), np.array([t, h, d]), SEM_PANEL),
        (np.array([w - t, h, 0.0]), np.array([t, h, d]), SEM_PANEL),
        (np.array([0.0, 2 * h - t, 0.0]), np.array([w, t, d]), SEM_TOP),
        (np.array([0.0, t, 0.0]), np.array([w, t, d]), SEM_PANEL),
        (np.array([0.0, h, -d + t]), np.array([w, h, t]), SEM_PANEL),
    ]
    n_shelves = int(rng.integers(1, 3))
    for i in range(n_shelves):
        y = 2 * h * (i + 1) / (n_shelves + 1)
        parts.append((np.array([0.0, y, 0.0]),
                      np.array([w - 2 * t, t, d - t]), SEM_SHELF))
    return parts


_LAYOUTS = {}  # filled after _chair_layout is defined


def _chair_layout(rng: np.random.Generator):
    """Random chair: (center, half, sem) per part. 6 parts."""
    seat_w = rng.uniform(0.3, 0.5)
    seat_d = rng.uniform(0.3, 0.5)
    seat_t = rng.uniform(0.03, 0.08)
    seat_h = rng.uniform(0.3, 0.5)
    back_h = rng.uniform(0.3, 0.6)
    back_t = rng.uniform(0.03, 0.08)
    leg_r = rng.uniform(0.02, 0.05)

    parts = [
        (np.array([0.0, seat_h, 0.0]),
         np.array([seat_w, seat_t, seat_d]), SEM_SEAT),
        (np.array([0.0, seat_h + back_h, -seat_d + back_t]),
         np.array([seat_w, back_h, back_t]), SEM_BACK),
    ]
    for sx in (-1, 1):
        for sz in (-1, 1):
            parts.append((
                np.array([sx * (seat_w - leg_r), seat_h / 2.0,
                          sz * (seat_d - leg_r)]),
                np.array([leg_r, seat_h / 2.0, leg_r]), SEM_LEG))
    return parts


@dataclass
class SyntheticData:
    """Fixed-shape arrays for the whole synthetic corpus."""

    # targets
    points: np.ndarray        # [T, N, 3]
    labels: np.ndarray        # [T, N] int part id
    semantics: np.ndarray     # [T, N] int semantic class
    model_ids: np.ndarray     # [T]
    num_parts: np.ndarray     # [T]
    part_sems: np.ndarray     # [T, P] semantic class per part (-pad 0)
    # source database
    src_points: np.ndarray    # [S, n, 3]
    src_mats: np.ndarray      # [S, 3n, 6]
    src_default: np.ndarray   # [S, 6]
    src_sems: np.ndarray      # [S]
    # pseudo-label table: best source index per (target, part)
    label_table: np.ndarray   # [T, P] int, -1 for absent parts
    dist_src: np.ndarray      # [S, S] source-to-source distances
    # target-part-to-source distances — the synthetic stand-in for the
    # reference's per-part DCD pickles (``generate_pair.py:87-122``), the
    # relevance source for NDCG (``dataset_utils.py:1165-1176``)
    pair_dist: np.ndarray     # [T, P, S]


def generate(num_targets: int = 64, num_sources: int = 64,
             n_points: int = 2048, points_per_part: int = 1024,
             max_parts: int = 16, seed: int = 0,
             category: str = "chair") -> SyntheticData:
    if category not in _LAYOUTS:
        raise ValueError(f"unknown category {category!r}; "
                         f"have {sorted(_LAYOUTS)}")
    min_parts = {"chair": 6, "table": 5, "storage": 7}[category]
    if max_parts < min_parts:
        raise ValueError(f"synthetic {category}s have up to {min_parts} "
                         f"parts; max_parts >= {min_parts}")
    rng = np.random.default_rng(seed)
    layout_fn = _LAYOUTS[category]

    # ---- source database: individual boxes with sem labels ----
    src_points = np.zeros((num_sources, points_per_part, 3), np.float32)
    src_mats = np.zeros((num_sources, 3 * points_per_part, 6), np.float32)
    src_default = np.zeros((num_sources, 6), np.float32)
    src_sems = np.zeros((num_sources,), np.int32)
    src_half = np.zeros((num_sources, 3), np.float32)
    for s in range(num_sources):
        # source parts live at their donor shape's assembly position (the
        # reference keeps parts in shape coordinates — ``run_preprocessing
        # .py`` samples the part mesh in place — so target-part-to-source
        # DCD distances land in the 0.08-threshold regime of
        # ``get_labels``, dataset_utils.py:1118)
        if category == "chair":
            # this branch's RNG draw order is frozen: cached pair archives
            # from earlier chair corpora must stay reproducible
            sem = [SEM_SEAT, SEM_BACK, SEM_LEG][s % 3]
            seat_h = rng.uniform(0.3, 0.5)
            seat_d = rng.uniform(0.3, 0.5)
            if sem == SEM_SEAT:
                half = rng.uniform([0.3, 0.03, 0.3], [0.5, 0.08, 0.5])
                center = np.array([0.0, seat_h, 0.0])
            elif sem == SEM_BACK:
                half = rng.uniform([0.3, 0.3, 0.03], [0.5, 0.6, 0.08])
                center = np.array([0.0, seat_h + half[1],
                                   -seat_d + half[2]])
            else:
                leg_r = rng.uniform(0.02, 0.05)
                half = np.array([leg_r, seat_h / 2.0, leg_r])
                seat_w = rng.uniform(0.3, 0.5)
                sx = rng.choice([-1.0, 1.0])
                sz = rng.choice([-1.0, 1.0])
                center = np.array([sx * (seat_w - leg_r), seat_h / 2.0,
                                   sz * (seat_d - leg_r)])
        else:
            # donor part from a fresh random layout (keeps assembly
            # positions and covers every semantic class of the category)
            parts = layout_fn(rng)
            center, half, sem = parts[s % len(parts)]
        pts = sample_box_surface(rng, points_per_part, center, half)
        box = aabbox_of_points(pts)
        src_points[s] = pts
        src_mats[s] = compute_param_linear_equation(pts, box)
        src_default[s] = get_default_param(box)
        src_sems[s] = sem
        src_half[s] = half

    # ---- targets: assembled chairs ----
    points = np.zeros((num_targets, n_points, 3), np.float32)
    labels = np.zeros((num_targets, n_points), np.int32)
    semantics = np.zeros((num_targets, n_points), np.int32)
    num_parts = np.zeros((num_targets,), np.int32)
    part_sems = np.zeros((num_targets, max_parts), np.int32)
    label_table = np.full((num_targets, max_parts), -1, np.int64)
    tgt_part_half = np.zeros((num_targets, max_parts, 3), np.float32)

    for t in range(num_targets):
        parts = layout_fn(rng)
        k = len(parts)
        num_parts[t] = k
        # proportional point budget with remainder to the first part
        per = np.full(k, n_points // k)
        per[0] += n_points - per.sum()
        cursor = 0
        for pi, (center, half, sem) in enumerate(parts):
            pts = sample_box_surface(rng, int(per[pi]), center, half)
            points[t, cursor:cursor + per[pi]] = pts
            labels[t, cursor:cursor + per[pi]] = pi
            semantics[t, cursor:cursor + per[pi]] = sem
            part_sems[t, pi] = sem
            tgt_part_half[t, pi] = half
            cursor += per[pi]
        # shuffle point order so parts are interleaved like real scans
        perm = rng.permutation(n_points)
        points[t] = points[t][perm]
        labels[t] = labels[t][perm]
        semantics[t] = semantics[t][perm]

    # ---- target-part-to-source distance matrix (half-extent proxy for the
    # PartNet pipeline's on-device DCD pair matrices) + pseudo-labels ----
    pair_dist = np.linalg.norm(
        src_half[None, None, :, :] - tgt_part_half[:, :, None, :],
        axis=-1).astype(np.float32)                      # [T, P, S]
    pair_dist += 1e6 * (part_sems[:, :, None] != src_sems[None, None, :])
    for t in range(num_targets):
        for pi in range(num_parts[t]):
            label_table[t, pi] = np.argmin(pair_dist[t, pi])

    # ---- source-to-source distance matrix (half-extent proxy; the PartNet
    # pipeline computes real DCD distances on device) ----
    dist_src = np.linalg.norm(
        src_half[:, None, :] - src_half[None, :, :], axis=-1)
    dist_src += 1e6 * (src_sems[:, None] != src_sems[None, :])

    return SyntheticData(
        points=points, labels=labels, semantics=semantics,
        model_ids=np.arange(num_targets), num_parts=num_parts,
        part_sems=part_sems,
        src_points=src_points, src_mats=src_mats, src_default=src_default,
        src_sems=src_sems, label_table=label_table,
        dist_src=dist_src.astype(np.float32), pair_dist=pair_dist)


def export_partnet_tree(data: SyntheticData, base_dir: str,
                        category: str = "chair",
                        num_train: Optional[int] = None) -> dict:
    """Write a SyntheticData corpus as a PartNet-layout data tree, so the
    flagship real-data CLI chain (``data.pairs`` -> ``engine.train`` ->
    ``engine.evaluate``/``vis``) runs on it exactly as it would on real
    preprocessed PartNet (reference tree layout: per-part source h5 dir +
    datasplit pickle + combined target h5s, ``engine/generate_combined_h5
    .py`` / ``run_preprocessing.py:829-868``).

    Targets are split ``num_train`` / rest-test (default 80/20).  Source
    h5s carry the exact parametric models (points, A-matrices, default
    params, aabb box) and vocabulary labels whose ``label_id`` round-trips
    to the generator's semantic ids.  Returns the path dict.
    """
    import os

    from ured_tpu.data import io
    from ured_tpu.data.parametric import aabbox_of_points
    from ured_tpu.data.vocab import IDX_TO_LABEL

    s = data.src_points.shape[0]
    t = data.points.shape[0]
    num_train = int(0.8 * t) if num_train is None else num_train

    src_dir = os.path.join(base_dir, "data_aabb_all_models", category, "h5")
    split_dir = os.path.join(base_dir, "generated_datasplits")
    os.makedirs(src_dir, exist_ok=True)
    os.makedirs(split_dir, exist_ok=True)

    from ured_tpu.data.parametric import compute_param_linear_equation

    # unit-cube corner mesh (sources are box surfaces): gives the vis /
    # OBJ-export path real vertices_mat payloads
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                        for z in (-1, 1)], np.float64)
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)

    names = []
    for i in range(s):
        name = f"src{i}"
        box = aabbox_of_points(data.src_points[i])
        verts = corners * (box[3:6] / 2.0) + box[0:3]
        io.save_part_h5(os.path.join(src_dir, name + ".h5"), io.PartModel(
            box_params=box,
            default_param=data.src_default[i],
            points=data.src_points[i],
            points_mat=data.src_mats[i],
            sem_label=IDX_TO_LABEL[int(data.src_sems[i])],
            vertices=verts,
            vertices_mat=compute_param_linear_equation(verts, box),
            faces=faces,
            model_id=name))
        names.append(name)

    train_ids = [str(m) for m in data.model_ids[:num_train]]
    test_ids = [str(m) for m in data.model_ids[num_train:]]
    pickle_path = os.path.join(split_dir, f"{category}_{s}.pickle")
    io.save_datasplits(pickle_path, names, train_ids, test_ids)

    out = {"sources_dir": src_dir, "datasplits": pickle_path}
    for mode, lo, hi in (("train", 0, num_train), ("test", num_train, t)):
        path = os.path.join(split_dir, f"{category}_{s}_{mode}.h5")
        io.save_targets_h5(path, data.points[lo:hi], data.labels[lo:hi],
                           data.semantics[lo:hi], data.model_ids[lo:hi])
        out[mode] = path
    return out


def make_batch(data: SyntheticData, idx: np.ndarray,
               max_parts: int = 16) -> Dict[str, np.ndarray]:
    """Assemble the fixed-shape train batch the URED model consumes.

    Gathers the pseudo-labeled source parts (their points, A-matrices and
    semantics) for each target in ``idx`` — the vectorized analogue of
    reference ``get_source_info`` / ``get_source_points``
    (``dataset_utils.py:791-820,1008-1032``).  Padded part slots reuse source
    0 but are masked by ``src_valid``.
    """
    lt = data.label_table[idx]                     # [B, P]
    safe = np.where(lt >= 0, lt, 0)
    return {
        "x": data.points[idx],
        "labels": data.labels[idx],
        "tgt_sem": data.semantics[idx],
        "src_points": data.src_points[safe],
        "src_sem": data.src_sems[safe].astype(np.int32),
        "src_mat": data.src_mats[safe],
        "src_valid": (lt >= 0).astype(np.float32),
    }


_LAYOUTS.update(chair=_chair_layout, table=_table_layout,
                storage=_storage_layout)
