"""Real-scan targets: ROCA/ScanNet depth back-projection.

Capability port of reference ``dataset/ROCA_dataset.py``: predicted depth
maps + instance masks from ROCA detections become object-frame partial point
clouds (``get_target_points:84-153``), using the detection's quaternion pose
(``:44``), camera intrinsics back-projection, and normalization into the
canonical frame the retrieval/deformation model expects.  Pure numpy —
no cv2 dependency for the math (cv2 only if you load images with it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


def quaternion_to_matrix(q: np.ndarray) -> np.ndarray:
    """(w, x, y, z) quaternion -> 3x3 rotation (reference ``:44`` uses
    scipy's convention; this matches for unit quaternions)."""
    w, x, y, z = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def backproject_depth(depth: np.ndarray, intrinsics: np.ndarray,
                      mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Depth map [H, W] (meters) + K [3, 3] -> camera-frame points [M, 3].

    Pixels with zero/invalid depth or outside the mask are dropped.
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    vs, us = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    valid = depth > 0
    if mask is not None:
        valid &= mask.astype(bool)
    z = depth[valid]
    u = us[valid]
    v = vs[valid]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    return np.stack([x, y, z], axis=-1)


def to_object_frame(points_cam: np.ndarray, rotation: np.ndarray,
                    translation: np.ndarray,
                    scale: Optional[np.ndarray] = None) -> np.ndarray:
    """Camera-frame points -> canonical object frame given the detection
    pose (R, t, optional per-axis scale): p_obj = S^-1 R^T (p - t)."""
    p = (np.asarray(points_cam, np.float64) - translation) @ rotation
    if scale is not None:
        p = p / np.maximum(np.asarray(scale, np.float64), 1e-9)
    return p


def sample_fixed(points: np.ndarray, n: int,
                 rng: np.random.Generator) -> np.ndarray:
    """Random up/down-sample to exactly n points (fixed shapes for TPU)."""
    m = points.shape[0]
    if m == 0:
        return np.zeros((n, 3))
    idx = rng.choice(m, size=n, replace=m < n)
    return points[idx]


@dataclass
class ROCADetection:
    depth: np.ndarray          # [H, W] predicted depth (m)
    mask: np.ndarray           # [H, W] instance mask
    intrinsics: np.ndarray     # [3, 3]
    q: np.ndarray              # [4] (w, x, y, z) object rotation
    t: np.ndarray              # [3] object translation (camera frame)
    scale: Optional[np.ndarray] = None  # [3] anisotropic object scale


class ROCADataset:
    """Object-frame partial clouds from ROCA detections
    (reference ``ROCA_dataset.py:ROCA_dataset:12``)."""

    def __init__(self, detections: List[ROCADetection],
                 num_points: int = 1024, seed: int = 0,
                 recenter: bool = True):
        self.detections = detections
        self.num_points = num_points
        self.recenter = recenter
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.detections)

    def get_target_points(self, i: int) -> np.ndarray:
        det = self.detections[i]
        cam = backproject_depth(det.depth, det.intrinsics, det.mask)
        r = quaternion_to_matrix(det.q)
        obj = to_object_frame(cam, r, det.t, det.scale)
        obj = sample_fixed(obj, self.num_points, self._rng)
        if self.recenter:
            obj = obj - obj.mean(axis=0, keepdims=True)
        return obj.astype(np.float32)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        pts = self.get_target_points(i)
        return {"x": pts,
                "mask_area": np.asarray(
                    self.detections[i].mask.sum(), np.int32)}
