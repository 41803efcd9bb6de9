"""Offline preprocessing: StructureNet shapes -> parametric part models.

Stage-1 pipeline of the reference (``engine/run_preprocessing.py``), pure
numpy, process-parallel over shapes via joblib on CPU hosts:

  hierarchy JSON -> leaf parts -> merged part meshes -> AABB box ->
  per-vertex A-matrix -> area-weighted surface sampling (points + their
  A-rows) -> part connectivity (joints) -> linear constraint matrix +
  null-space projection -> per-part h5.

The sampling here is vectorized (one multinomial over faces + batched
barycentric mixing of A-matrix rows) instead of the reference's per-point
python loops (``run_preprocessing.py:271-292``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ured_tpu.data import io
from ured_tpu.data.parametric import (
    aabbox_of_points,
    compute_param_linear_equation,
    get_default_param,
    normalize_pts,
)
from ured_tpu.data.vocab import ADJACENCY_TOL, NUM_SAMPLE_POINTS


# ---------------------------------------------------------------------------
# Hierarchy traversal
# ---------------------------------------------------------------------------

def collect_leaf_nodes(hier_json_path: str) -> List[dict]:
    """Leaves of a StructureNet hierarchy with slash-joined label paths
    (reference ``collect_leaf_nodes:61-81`` semantics)."""
    with open(hier_json_path) as f:
        root = json.load(f)
    root.setdefault("level", 0)
    stack, leaves = [root], []
    while stack:
        node = stack.pop()
        children = node.get("children")
        if not children:
            leaves.append(node)
            continue
        for child in children:
            child["level"] = node["level"] + 1
            child["label"] = f"{node['label']}/{child['label']}"
            stack.append(child)
    return leaves


def attach_part_meshes(partnet_json_path: str, nodes: List[dict]) -> None:
    """Attach the PartNet result.json's obj lists to matching nodes by id
    (reference ``find_corresponding_meshes:84-100``)."""
    with open(partnet_json_path) as f:
        data = json.load(f)
    by_id = {n["id"]: n for n in nodes}
    stack = list(data)
    while stack:
        elem = stack.pop()
        if elem["id"] in by_id:
            by_id[elem["id"]]["objs"] = elem["objs"]
        stack.extend(elem.get("children", []))


def load_part_mesh(obj_dir: str, objs: Sequence[str]
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Merge a part's obj fragments into one normalized mesh."""
    verts_all, faces_all = [], []
    offset = 0
    for name in objs:
        v, f = io.read_obj(os.path.join(obj_dir, f"{name}.obj"))
        verts_all.append(v)
        faces_all.append(f + offset)
        offset += len(v)
    v = np.concatenate(verts_all)
    f = np.concatenate(faces_all)
    return normalize_pts(v), f


# ---------------------------------------------------------------------------
# Surface sampling
# ---------------------------------------------------------------------------

def face_areas(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    a = v[f[:, 1]] - v[f[:, 0]]
    b = v[f[:, 2]] - v[f[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=1)


def sample_surface_with_mat(v: np.ndarray, f: np.ndarray,
                            vertex_mat: np.ndarray, n: int,
                            rng: np.random.Generator,
                            use_native: bool = True) -> np.ndarray:
    """Sample n surface points' A-matrix rows: PA [3n, 6].

    A sampled point is a barycentric mix of its triangle's vertices, and the
    parametric map is linear, so the point's A-rows are the same mix of the
    vertex A-rows (reference ``sample_points:271-292`` — vectorized; runs
    through the OpenMP native library when built).
    """
    if use_native:
        from ured_tpu.utils.native import get_lib, sample_surface_native

        if get_lib() is not None:
            _, pa = sample_surface_native(
                v, f, vertex_mat, n,
                seed=int(rng.integers(0, 2 ** 63 - 1)))
            return pa
    areas = face_areas(v, f)
    probs = areas / areas.sum()
    fids = rng.choice(len(f), size=n, p=probs)
    w = rng.uniform(size=(n, 3))
    w = w / w.sum(axis=1, keepdims=True)

    va = vertex_mat.reshape(-1, 3, 6)            # [V, 3, 6] rows per vertex
    tri = va[f[fids]]                            # [n, 3verts, 3, 6]
    pa = np.einsum("nv,nvij->nij", w, tri)       # [n, 3, 6]
    return pa.reshape(3 * n, 6)


# ---------------------------------------------------------------------------
# Connectivity
# ---------------------------------------------------------------------------

def _min_pair_distance(p1: np.ndarray, p2: np.ndarray
                       ) -> Tuple[float, np.ndarray]:
    from ured_tpu.utils.native import get_lib, min_pair_distance_native

    if get_lib() is not None:
        return min_pair_distance_native(p1, p2)
    d = ((p1[:, None] - p2[None]) ** 2).sum(-1)
    i, j = np.unravel_index(np.argmin(d), d.shape)
    return float(np.sqrt(d[i, j])), (p1[i] + p2[j]) / 2.0


def detect_connectivity(part_points: List[np.ndarray],
                        tol: float = ADJACENCY_TOL
                        ) -> Tuple[List[Tuple[int, int]], List[np.ndarray]]:
    """Connected part pairs + joint points (reference ``get_connectivity:
    479-546`` base mode: closest-point midpoint joints)."""
    pairs, joints = [], []
    k = len(part_points)
    for i in range(k):
        for j in range(i + 1, k):
            dist, joint = _min_pair_distance(part_points[i], part_points[j])
            if dist < tol:
                pairs.append((i, j))
                joints.append(joint)
    return pairs, joints


def joint_constraint_rows(boxes: List[np.ndarray],
                          pairs: List[Tuple[int, int]],
                          joints: List[np.ndarray]) -> np.ndarray:
    """Linear constraint matrix C [3J, 6K] with C @ params = 0 for joint
    consistency: the joint point expressed through part i's parametric model
    must equal its expression through part j's
    (reference ``get_linear_connectivity_constraints:549`` +
    ``get_connectivity_matrix:572``)."""
    k = len(boxes)
    rows = []
    for (i, j), p in zip(pairs, joints):
        bi = compute_param_linear_equation(p[None], boxes[i])   # [3, 6]
        bj = compute_param_linear_equation(p[None], boxes[j])   # [3, 6]
        row = np.zeros((3, 6 * k))
        row[:, 6 * i:6 * i + 6] = bi
        row[:, 6 * j:6 * j + 6] = -bj
        rows.append(row)
    if not rows:
        return np.zeros((0, 6 * k))
    return np.concatenate(rows, axis=0)


def constraint_projection(c: np.ndarray, rcond: float = 1e-10) -> np.ndarray:
    """Orthogonal projector onto the null space of C: params satisfying the
    joint constraints exactly (reference
    ``get_constraint_projection_matrix:599``)."""
    n = c.shape[1]
    if c.shape[0] == 0:
        return np.eye(n)
    _, s, vt = np.linalg.svd(c, full_matrices=True)
    rank = int(np.sum(s > rcond * s.max())) if s.size else 0
    null = vt[rank:].T                               # [n, n-rank]
    return null @ null.T


def box_keypoints(box: np.ndarray) -> np.ndarray:
    """26 box keypoints: 6 face centers, 12 edge midpoints, 8 corners
    (reference ``get_part_keypoints:415-478``)."""
    c = np.asarray(box[:3])
    sx = np.array([box[3] / 2.0, 0, 0])
    sy = np.array([0, box[4] / 2.0, 0])
    sz = np.array([0, 0, box[5] / 2.0])
    kps = []
    for ax in (sx, sy, sz):
        kps += [c - ax, c + ax]
    axes = [(sx, sy), (sx, sz), (sy, sz)]
    for a, b in axes:
        kps += [c - a - b, c - a + b, c + a - b, c + a + b]
    for s1 in (-1, 1):
        for s2 in (-1, 1):
            for s3 in (-1, 1):
                kps.append(c + s1 * sx + s2 * sy + s3 * sz)
    return np.asarray(kps)


def separating_axis(p1: np.ndarray, p2: np.ndarray) -> int:
    """Axis (0/1/2) with the smallest interval IoU between the two parts'
    extents (reference ``get_separating_axis:355-414``)."""
    ious = []
    for ax in range(3):
        lo1, hi1 = p1[:, ax].min(), p1[:, ax].max()
        lo2, hi2 = p2[:, ax].min(), p2[:, ax].max()
        inter = abs(min(hi1, hi2) - max(lo1, lo2))
        union = abs(max(hi1, hi2) - min(lo1, lo2))
        ious.append(inter / union if union > 0 else 0.0)
    return int(np.argmin(ious))


# ---------------------------------------------------------------------------
# Per-shape pipeline
# ---------------------------------------------------------------------------

@dataclass
class ProcessedPart:
    label: str
    box: np.ndarray
    default_param: np.ndarray
    points: np.ndarray
    points_mat: np.ndarray
    vertices: np.ndarray
    vertices_mat: np.ndarray
    faces: np.ndarray


def process_shape(hier_json: str, partnet_json: Optional[str],
                  obj_dir: Optional[str],
                  n_sample_points: int = NUM_SAMPLE_POINTS,
                  points_per_part: int = 1024,
                  seed: int = 0,
                  meshes: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
                  adjacency_tol: float = ADJACENCY_TOL,
                  ) -> Tuple[List[ProcessedPart], np.ndarray, np.ndarray]:
    """Process one shape: returns (parts, constraint matrix C, projector).

    ``meshes`` may inject (V, F) per leaf directly (tests / non-PartNet
    sources); otherwise they are loaded from ``obj_dir`` via the hierarchy.
    """
    rng = np.random.default_rng(seed)
    leaves = collect_leaf_nodes(hier_json)
    if meshes is None:
        if partnet_json:
            attach_part_meshes(partnet_json, leaves)
        meshes = [load_part_mesh(obj_dir, leaf["objs"]) for leaf in leaves]

    parts: List[ProcessedPart] = []
    for leaf, (v, f) in zip(leaves, meshes):
        box = aabbox_of_points(v)
        vmat = compute_param_linear_equation(v, box)
        x0 = get_default_param(box)
        pmat = sample_surface_with_mat(v, f, vmat, points_per_part, rng)
        pts = (pmat @ x0).reshape(-1, 3)
        parts.append(ProcessedPart(
            label=leaf["label"], box=box, default_param=x0,
            points=pts, points_mat=pmat,
            vertices=v, vertices_mat=vmat, faces=f))

    pairs, joints = detect_connectivity([p.points for p in parts],
                                        tol=adjacency_tol)
    c = joint_constraint_rows([p.box for p in parts], pairs, joints)
    proj = constraint_projection(c)
    return parts, c, proj


def save_parts(out_dir: str, model_id: str,
               parts: List[ProcessedPart],
               constraint_mat: Optional[np.ndarray] = None,
               constraint_proj: Optional[np.ndarray] = None) -> List[str]:
    """One h5 per part, named ``{model_id}_{part_idx}.h5`` (the reference's
    per-part file convention, ``save_part_data:829-868``).

    ``constraint_mat`` [3J, 6K] / ``constraint_proj`` [6K, 6K] — the owning
    shape's joint constraints from ``process_shape`` — are persisted into
    every part's h5 (reference keys ``constraint_mat`` /
    ``constraint_proj_mat``) together with the part's block index, so any
    loaded part can reconstruct the whole-shape coupling."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, p in enumerate(parts):
        path = os.path.join(out_dir, f"{model_id}_{i}.h5")
        io.save_part_h5(path, io.PartModel(
            box_params=p.box, default_param=p.default_param,
            points=p.points, points_mat=p.points_mat,
            sem_label=p.label, vertices=p.vertices,
            vertices_mat=p.vertices_mat, faces=p.faces,
            constraint_mat=constraint_mat,
            constraint_proj=constraint_proj, part_index=i))
        paths.append(path)
    return paths


def process_corpus(shape_specs: List[dict], out_dir: str,
                   n_jobs: int = 8, **kw) -> None:
    """Process many shapes in parallel (replaces the 48-process joblib
    driver, ``run_preprocessing.py:971-973``).  Each spec: {model_id,
    hier_json, partnet_json, obj_dir}."""
    from joblib import Parallel, delayed

    def one(spec):
        parts, c, proj = process_shape(
            spec["hier_json"], spec.get("partnet_json"),
            spec.get("obj_dir"), **kw)
        save_parts(out_dir, spec["model_id"], parts,
                   constraint_mat=c, constraint_proj=proj)

    Parallel(n_jobs=n_jobs)(delayed(one)(s) for s in shape_specs)


def main(argv):
    """``python -m ured_tpu.data.preprocessing specs.json out_dir [n_jobs]``
    — the role of reference ``engine/run_preprocessing.py``: each entry of
    ``specs.json`` is {model_id, hier_json, partnet_json?, obj_dir?}; every
    shape becomes per-part h5 files (A-matrices, sampled points,
    connectivity, keypoints, constraint projections) under ``out_dir``."""
    import json

    if len(argv) < 3:
        print(__doc__)
        print("usage: python -m ured_tpu.data.preprocessing "
              "specs.json out_dir [n_jobs]")
        return
    with open(argv[1]) as f:
        specs = json.load(f)
    n_jobs = int(argv[3]) if len(argv) > 3 else 8
    process_corpus(specs, argv[2], n_jobs=n_jobs)
    print(f"processed {len(specs)} shapes -> {argv[2]}")


if __name__ == "__main__":
    import sys

    main(sys.argv)


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)
