"""Rotation / transform matrices (reference ``train_utils/random_rot.py``).

Pure numpy, used by the host-side augmentation pipeline; the X->Y->Z
composition order matches ``random_rot.py:rotation_matrix_3d:74``.
"""

from __future__ import annotations

import numpy as np


def rot_x(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rot_y(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def rot_z(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def rotation_matrix_3d(ax: float, ay: float, az: float) -> np.ndarray:
    """4x4 rotation, X then Y then Z (degrees)."""
    return rot_z(az) @ rot_y(ay) @ rot_x(ax)


def scale_matrix(s) -> np.ndarray:
    m = np.eye(4)
    m[0, 0], m[1, 1], m[2, 2] = np.broadcast_to(np.asarray(s), (3,))
    return m


def translation_matrix(t) -> np.ndarray:
    m = np.eye(4)
    m[:3, 3] = np.asarray(t)
    return m


def random_rotation(rng: np.random.Generator,
                    max_deg: float = 10.0) -> np.ndarray:
    """Small random rotation as used for target augmentation
    (reference ``dataset/partnet_dataset.py:73-78``)."""
    a = rng.uniform(-max_deg, max_deg, size=3)
    return rotation_matrix_3d(a[0], a[1], a[2])[:3, :3]
