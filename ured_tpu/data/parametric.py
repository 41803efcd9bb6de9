"""Parametric deformation model construction (offline, pure numpy).

Re-derivation of the reference preprocessing math
(``engine/run_preprocessing.py:get_default_param:104`` and
``compute_param_linear_equation:118-160``): each part's oriented box
(center c, full scale 2s, axes ax/ay) defines local coordinates
``q = S^-1 R^-1 (p - t)`` per point, so the point is a *linear* function of
the 6 box parameters: ``p = A @ [t, s]`` with ``A = [I | R diag(q)]``.
Deforming the box (translate/scale) moves every sampled point analytically —
this is the "parametric model" the network's 6 predicted deltas act on.

Runs on CPU hosts during preprocessing; no JAX dependency.
"""

from __future__ import annotations

import numpy as np


def get_default_param(box: np.ndarray) -> np.ndarray:
    """Box [12] = (c, 2s, ax, ay) -> rest parameters [6] = (t, s)."""
    box = np.asarray(box, dtype=np.float64)
    c, double_s = box[0:3], box[3:6]
    return np.concatenate([c, 0.5 * double_s])


def box_rotation(box: np.ndarray) -> np.ndarray:
    """Rotation matrix with the box axes as columns (z = x cross y)."""
    box = np.asarray(box, dtype=np.float64)
    ax, ay = box[6:9], box[9:12]
    az = np.cross(ax, ay)
    return np.stack([ax, ay, az], axis=1)


def compute_param_linear_equation(P: np.ndarray, box: np.ndarray) -> np.ndarray:
    """Per-point linear map A [3N, 6] with ``A @ (t, s) == P.reshape(-1)``.

    Vectorized equivalent of reference ``run_preprocessing.py:118-160``.
    """
    P = np.asarray(P, dtype=np.float64)
    box = np.asarray(box, dtype=np.float64)
    assert P.ndim == 2 and P.shape[1] == 3
    assert box.size == 12
    n = P.shape[0]

    R = box_rotation(box)
    s = 0.5 * box[3:6]
    t = box[0:3]

    # local coords q = S^-1 R^T (p - t)
    Q = ((P - t) @ R) / s  # [N, 3]

    A_s = Q[:, None, :] * R[None, :, :]          # [N, 3, 3] = R diag(q)
    A_t = np.broadcast_to(np.eye(3), (n, 3, 3))  # [N, 3, 3]
    A = np.concatenate([A_t, A_s], axis=2)       # [N, 3, 6]
    return A.reshape(3 * n, 6)


def aabbox_of_points(vertices: np.ndarray) -> np.ndarray:
    """Axis-aligned box [12] of a vertex set (reference
    ``run_preprocessing.py:compute_aabbox:217-240`` — note the 2s convention)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    mn = vertices.min(axis=0)
    mx = vertices.max(axis=0)
    box = np.zeros(12)
    box[0:3] = (mn + mx) / 2.0
    box[3:6] = mx - mn
    box[6:9] = [1.0, 0.0, 0.0]
    box[9:12] = [0.0, 1.0, 0.0]
    return box


def normalize_pts(vertices: np.ndarray) -> np.ndarray:
    """Center at the AABB midpoint and scale the longest diagonal to 1
    (reference ``engine/geometry_utils.py:normalize_pts:88``)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    mn, mx = vertices.min(0), vertices.max(0)
    center = (mn + mx) / 2.0
    scale = np.linalg.norm(mx - mn)
    return (vertices - center) / max(scale, 1e-12)
