"""Geometry utilities (reference ``engine/geometry_utils.py`` living parts).

Normal estimation and connected-component detection for point clouds, plus
the normalization re-export — everything else from that module (mesh/PC I/O,
chamfer wrappers) lives in ``data.io`` and ``ops``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ured_tpu.data.parametric import normalize_pts  # noqa: F401 (re-export)


def estimate_normals(points: np.ndarray, k: int = 16) -> np.ndarray:
    """Per-point normals via local PCA over k nearest neighbors
    (reference ``compute_normal:238``).  Host-side numpy; orientation is
    sign-ambiguous (normalized to positive z-hemisphere).
    """
    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    nbrs = pts[idx]                                 # [N, k, 3]
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]                         # smallest eigenvector
    flip = normals[:, 2:3] < 0
    return np.where(flip, -normals, normals)


def connected_components(points: np.ndarray, radius: float
                         ) -> Tuple[np.ndarray, int]:
    """Group points into components whose neighbors lie within ``radius``
    (reference ``detect_connected_component:281``).  Returns (labels [N],
    num_components)."""
    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    adj = d <= radius
    labels = np.full(n, -1, np.int64)
    comp = 0
    for seed in range(n):
        if labels[seed] >= 0:
            continue
        stack = [seed]
        labels[seed] = comp
        while stack:
            u = stack.pop()
            for v in np.where(adj[u] & (labels < 0))[0]:
                labels[v] = comp
                stack.append(v)
        comp += 1
    return labels, comp
