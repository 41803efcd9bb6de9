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


def subset_projection(constraint_mat: np.ndarray,
                      part_ids: Sequence[int],
                      zero_tol: float = 1e-9) -> np.ndarray:
    """Null-space projector for a SUBSET of a shape's parts.

    ``constraint_mat`` [3J, 6K] couples all K parts of the owning shape;
    when only ``part_ids`` of them are in play (the per-part retrieval can
    pick any subset), the applicable constraints are exactly the rows whose
    support lies inside the selected blocks — constraints touching an
    absent part cannot be enforced.  Returns the [6k, 6k] projector over
    the selected blocks in ``part_ids`` order (a sliced-and-reprojected
    form of reference ``get_constraint_projection_matrix:599``; slicing the
    full NNT projector would NOT be a projector).
    """
    from ured_tpu.data.preprocessing import constraint_projection

    c = np.asarray(constraint_mat)
    ids = list(part_ids)
    cols = np.concatenate([np.arange(6 * i, 6 * i + 6) for i in ids])
    inside = np.zeros(c.shape[1], bool)
    inside[cols] = True
    sub = c[:, cols]
    keep = (np.abs(c[:, ~inside]).max(axis=1, initial=0.0) <= zero_tol) \
        & (np.abs(sub).max(axis=1, initial=0.0) > zero_tol)
    return constraint_projection(sub[keep])


def _project_group_params(params_abs: np.ndarray, ids: Sequence[int],
                          constraint_mat: np.ndarray,
                          part_ids_in_shape: Sequence[int]) -> np.ndarray:
    """Weld the joints among a group of co-retrieved parts: project the
    group's flattened absolute params onto the null space of the owning
    shape's applicable constraints.  ``ids`` index ``params_abs`` rows;
    ``part_ids_in_shape`` are the same parts' blocks inside the shape."""
    proj = subset_projection(constraint_mat, part_ids_in_shape)
    flat = params_abs[list(ids)].reshape(-1)
    out = params_abs.copy()
    out[list(ids)] = (proj @ flat).reshape(len(ids), 6)
    return out


def export_deformed_assembly(
        out_dir: str, name: str,
        vertices_mats: Sequence[np.ndarray],
        faces: Sequence[np.ndarray],
        params: np.ndarray,
        default_params: Optional[np.ndarray] = None,
        alpha: float = 0.1,
        part_mask: Optional[np.ndarray] = None,
        shape_keys: Optional[Sequence] = None,
        constraint_mats: Optional[Sequence[Optional[np.ndarray]]] = None,
        part_indices: Optional[Sequence[int]] = None) -> List[str]:
    """Write one OBJ per deformed part plus the combined assembly.

    params [P, 6]; default_params [P, 6] (target part AABBs at eval time);
    part_mask [P] selects live parts.  Returns the written paths
    (``{name}_part{i}.obj`` + ``{name}_combined.obj``).

    Connectivity (``cfg.use_connectivity`` wiring): when ``shape_keys``
    (per-part owning-shape key), ``constraint_mats`` (per-part owning
    shape's C) and ``part_indices`` (per-part block within that shape) are
    given, parts retrieved from the SAME source shape are deformed jointly
    — their absolute params are projected onto the shape's joint-constraint
    null space first, so shared joints stay welded (the whole-shape
    ``connectivity_mat`` semantics of reference ``get_shape_numpy``,
    ``dataset_utils.py:601-621``, generalized to retrieved subsets).
    """
    os.makedirs(out_dir, exist_ok=True)
    live = [i for i in range(len(vertices_mats))
            if part_mask is None or part_mask[i] > 0]

    # absolute params per part (alpha * delta + rest pose)
    p_abs = alpha * np.asarray(params, np.float64)
    if default_params is not None:
        p_abs = p_abs + np.asarray(default_params, np.float64)

    if shape_keys is not None and constraint_mats is not None \
            and part_indices is not None:
        # group co-retrieved parts per owning-shape INSTANCE: when two
        # target slots retrieve the SAME source part, each copy is its own
        # instance of the shape (duplicated blocks inside one projector
        # would turn each joint constraint C_i.p = 0 into C_i.(p1+p2) = 0)
        groups: dict = {}
        occ: dict = {}
        for i in live:
            if constraint_mats[i] is None or part_indices[i] < 0:
                continue
            inst = occ.get((shape_keys[i], part_indices[i]), 0)
            occ[(shape_keys[i], part_indices[i])] = inst + 1
            groups.setdefault((shape_keys[i], inst), []).append(i)
        for ids in groups.values():
            if len(ids) > 1:
                p_abs = _project_group_params(
                    p_abs, ids, constraint_mats[ids[0]],
                    [part_indices[i] for i in ids])

    paths = []
    all_v, all_f = [], []
    offset = 0
    for i in live:
        v = deform_vertices(vertices_mats[i], p_abs[i], None, alpha=1.0)
        path = os.path.join(out_dir, f"{name}_part{i}.obj")
        io.write_obj(path, v, faces[i])
        paths.append(path)
        all_v.append(v)
        all_f.append(np.asarray(faces[i]) + offset)
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
