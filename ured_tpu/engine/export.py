"""Mesh deformation and export (the ``engine/vis.py`` OBJ output path).

The retrieved source parts carry per-vertex A-matrices (``vertices_mat``);
applying the predicted 6-parameter deformation to them deforms the *mesh*
analytically — same math as the point path (reference
``vis.py:270-299`` -> ``get_shape_numpy`` -> ``output_visualization_mesh``,
``dataset_utils.py:277-339``).  Everything here is host-side numpy + OBJ
writing.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ured_tpu.data import io


def deform_vertices(vertices_mat: np.ndarray, params: np.ndarray,
                    default_param: Optional[np.ndarray] = None,
                    alpha: float = 1.0,
                    connectivity: Optional[np.ndarray] = None) -> np.ndarray:
    """vertices_mat [3V, 6] + predicted params [6] -> deformed verts [V, 3]
    (numpy twin of ``ops.deform.get_shape`` for ragged mesh payloads,
    reference ``get_shape_numpy``, ``dataset_utils.py:601-621``)."""
    p = alpha * np.asarray(params, np.float64)
    if default_param is not None:
        p = p + np.asarray(default_param, np.float64)
    if connectivity is not None:
        p = connectivity @ p
    return (np.asarray(vertices_mat, np.float64) @ p).reshape(-1, 3)


def export_deformed_assembly(
        out_dir: str, name: str,
        vertices_mats: Sequence[np.ndarray],
        faces: Sequence[np.ndarray],
        params: np.ndarray,
        default_params: Optional[np.ndarray] = None,
        alpha: float = 0.1,
        part_mask: Optional[np.ndarray] = None) -> List[str]:
    """Write one OBJ per deformed part plus the combined assembly.

    params [P, 6]; default_params [P, 6] (target part AABBs at eval time);
    part_mask [P] selects live parts.  Returns the written paths
    (``{name}_part{i}.obj`` + ``{name}_combined.obj``).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    all_v, all_f = [], []
    offset = 0
    for i, (vmat, f) in enumerate(zip(vertices_mats, faces)):
        if part_mask is not None and part_mask[i] <= 0:
            continue
        dp = default_params[i] if default_params is not None else None
        v = deform_vertices(vmat, params[i], dp, alpha)
        path = os.path.join(out_dir, f"{name}_part{i}.obj")
        io.write_obj(path, v, f)
        paths.append(path)
        all_v.append(v)
        all_f.append(np.asarray(f) + offset)
        offset += len(v)
    if all_v:
        combined = os.path.join(out_dir, f"{name}_combined.obj")
        io.write_obj(combined, np.concatenate(all_v),
                     np.concatenate(all_f))
        paths.append(combined)
    return paths


def export_point_cloud(out_dir: str, name: str, points: np.ndarray,
                       labels: Optional[np.ndarray] = None) -> str:
    """Colored PLY export of a (optionally part-labeled) cloud — the
    role of the reference's matplotlib/renderer snapshots
    (``dataset_utils.py:render_point_cloud:153``) without the external
    OSMesa binary."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.ply")
    colors = None
    if labels is not None:
        palette = np.asarray(
            [[228, 26, 28], [55, 126, 184], [77, 175, 74], [152, 78, 163],
             [255, 127, 0], [255, 255, 51], [166, 86, 40], [247, 129, 191],
             [153, 153, 153], [66, 206, 227], [31, 120, 180], [178, 223, 138],
             [51, 160, 44], [251, 154, 153], [227, 26, 28], [253, 191, 111]])
        colors = palette[np.asarray(labels) % len(palette)]
    io.write_ply_points(path, points, colors)
    return path
