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
from typing import Dict

import numpy as np

from ured_tpu.data.parametric import (
    aabbox_of_points,
    compute_param_linear_equation,
    get_default_param,
)

SEM_SEAT, SEM_BACK, SEM_LEG = 3, 4, 5  # arbitrary ids < 42


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
             max_parts: int = 16, seed: int = 0) -> SyntheticData:
    if max_parts < 6:
        raise ValueError("synthetic chairs have 6 parts; max_parts >= 6")
    rng = np.random.default_rng(seed)

    # ---- source database: individual boxes with sem labels ----
    src_points = np.zeros((num_sources, points_per_part, 3), np.float32)
    src_mats = np.zeros((num_sources, 3 * points_per_part, 6), np.float32)
    src_default = np.zeros((num_sources, 6), np.float32)
    src_sems = np.zeros((num_sources,), np.int32)
    src_half = np.zeros((num_sources, 3), np.float32)
    for s in range(num_sources):
        sem = [SEM_SEAT, SEM_BACK, SEM_LEG][s % 3]
        if sem == SEM_SEAT:
            half = rng.uniform([0.3, 0.03, 0.3], [0.5, 0.08, 0.5])
        elif sem == SEM_BACK:
            half = rng.uniform([0.3, 0.3, 0.03], [0.5, 0.6, 0.08])
        else:
            half = rng.uniform([0.02, 0.15, 0.02], [0.05, 0.25, 0.05])
        pts = sample_box_surface(rng, points_per_part, np.zeros(3), half)
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
        parts = _chair_layout(rng)
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
