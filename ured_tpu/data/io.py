"""File I/O: h5 part models, target datasets, splits, and mesh formats.

Covers the reference's storage contracts without its hard-coded paths:

  * per-part h5 (keys: box_params, default_param, points, points_mat, label,
    vertices, vertices_mat, faces) — reference ``dataset_utils.py:get_model:
    29-57`` / ``run_preprocessing.py:save_part_data:829-868``.
  * combined target h5 (data/label/semantic/model_id) — reference
    ``dataset_utils.py:load_h5:99-106`` / ``generate_combined_h5.py:84``.
  * datasplit pickles (sources/train/test) — reference
    ``dataset_utils.py:get_all_selected_models_pickle:88-96``.
  * OBJ / PLY / OFF / PTS mesh and point I/O — reference
    ``engine/geometry_utils.py:24-236`` (trimesh-free: plain parsers).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import List, Optional, Tuple

import h5py
import numpy as np


# ---------------------------------------------------------------------------
# Part-model h5
# ---------------------------------------------------------------------------

@dataclass
class PartModel:
    """One source part's parametric model."""

    box_params: np.ndarray       # [num_parts_in_shape, 12] or [12]
    default_param: np.ndarray    # [6]
    points: np.ndarray           # [n, 3]
    points_mat: np.ndarray       # [3n, 6]
    sem_label: str
    vertices: Optional[np.ndarray] = None      # [V, 3]
    vertices_mat: Optional[np.ndarray] = None  # [3V, 6]
    faces: Optional[np.ndarray] = None         # [F, 3]
    model_id: str = ""
    # whole-shape joint constraints of the OWNING shape (reference h5 keys
    # ``constraint_mat`` / ``constraint_proj_mat``, ``dataset_utils.py:
    # get_model:54-56`` / ``load_sources.py:102-105``): C [3J, 6K] with
    # C @ params = 0, and the [6K, 6K] null-space projector
    constraint_mat: Optional[np.ndarray] = None
    constraint_proj: Optional[np.ndarray] = None
    part_index: int = -1         # this part's block within the shape's 6K


def save_part_h5(path: str, part: PartModel) -> None:
    with h5py.File(path, "w") as f:
        f.create_dataset("box_params", data=part.box_params)
        f.create_dataset("default_param", data=part.default_param)
        f.create_dataset("points", data=part.points)
        f.create_dataset("points_mat", data=part.points_mat)
        f.create_dataset("label", data=np.bytes_(part.sem_label))
        if part.vertices is not None:
            f.create_dataset("vertices", data=part.vertices)
            f.create_dataset("vertices_mat", data=part.vertices_mat)
            f.create_dataset("faces", data=part.faces)
        if part.constraint_mat is not None:
            f.create_dataset("constraint_mat", data=part.constraint_mat)
            f.create_dataset("constraint_proj_mat",
                             data=part.constraint_proj)
            f.create_dataset("part_index", data=np.int64(part.part_index))


def load_part_h5(path: str, mesh: bool = True,
                 constraint: bool = False) -> PartModel:
    with h5py.File(path, "r") as f:
        label = f["label"][()]
        if isinstance(label, bytes):
            label = label.decode("utf-8")
        part = PartModel(
            box_params=f["box_params"][:],
            default_param=f["default_param"][:],
            points=f["points"][:],
            points_mat=f["points_mat"][:],
            sem_label=label,
            model_id=os.path.splitext(os.path.basename(path))[0],
        )
        if mesh and "vertices" in f:
            part.vertices = f["vertices"][:]
            part.vertices_mat = f["vertices_mat"][:]
            part.faces = f["faces"][:]
        if constraint and "constraint_mat" in f:
            part.constraint_mat = f["constraint_mat"][:]
            part.constraint_proj = f["constraint_proj_mat"][:]
            part.part_index = int(f["part_index"][()])
        return part


# ---------------------------------------------------------------------------
# Combined target h5
# ---------------------------------------------------------------------------

def save_targets_h5(path: str, points: np.ndarray, labels: np.ndarray,
                    semantics: np.ndarray, model_ids: np.ndarray) -> None:
    model_ids = np.asarray(model_ids)
    if model_ids.dtype.kind == "U":  # h5py cannot store unicode directly
        model_ids = model_ids.astype("S")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=points, compression="gzip")
        f.create_dataset("label", data=labels, compression="gzip")
        f.create_dataset("semantic", data=semantics, compression="gzip")
        f.create_dataset("model_id", data=model_ids)


def load_targets_h5(path: str):
    with h5py.File(path, "r") as f:
        return (f["data"][:], f["label"][:], f["semantic"][:],
                f["model_id"][:])


# ---------------------------------------------------------------------------
# Datasplit pickles
# ---------------------------------------------------------------------------

def save_datasplits(path: str, sources: List[str], train: List[str],
                    test: List[str], sources_part: Optional[List] = None,
                    source_cat: Optional[List] = None) -> None:
    d = {"sources": sources, "train": train, "test": test}
    if sources_part is not None:
        d["sources_part"] = sources_part
    if source_cat is not None:
        d["source_cat"] = source_cat
    with open(path, "wb") as f:
        pickle.dump(d, f)


def load_datasplits(path: str, all_models: bool = False):
    with open(path, "rb") as f:
        d = pickle.load(f)
    if not all_models:
        key = "sources_part" if "sources_part" in d else "sources"
        return d[key], d["train"], d["test"]
    return d["sources"], d.get("source_cat"), d["train"], d["test"]


# ---------------------------------------------------------------------------
# Mesh / point-cloud formats (trimesh-free)
# ---------------------------------------------------------------------------

def read_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Vertices [V, 3] + triangle faces [F, 3] (0-based) from Wavefront OBJ.
    Polygons are fan-triangulated."""
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                idx = [int(x.split("/")[0]) - 1 for x in t[1:]]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def write_obj(path: str, vertices: np.ndarray,
              faces: Optional[np.ndarray] = None) -> None:
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if faces is not None:
            for face in np.asarray(faces):
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def read_off(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path) as f:
        header = f.readline().strip()
        if header != "OFF":
            raise ValueError(f"not an OFF file: {path}")
        nv, nf, _ = (int(x) for x in f.readline().split())
        verts = np.array([[float(x) for x in f.readline().split()[:3]]
                          for _ in range(nv)])
        faces = []
        for _ in range(nf):
            t = [int(x) for x in f.readline().split()]
            for i in range(2, t[0]):
                faces.append([t[1], t[i], t[i + 1]])
    return verts, np.asarray(faces, np.int64)


def write_off(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(vertices)} {len(faces)} 0\n")
        for v in np.asarray(vertices):
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in np.asarray(faces):
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def read_pts(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float64)[:, :3]


def write_pts(path: str, points: np.ndarray) -> None:
    np.savetxt(path, np.asarray(points), fmt="%.6f")


def write_ply_points(path: str, points: np.ndarray,
                     colors: Optional[np.ndarray] = None) -> None:
    points = np.asarray(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(points):
            row = f"{p[0]} {p[1]} {p[2]}"
            if colors is not None:
                c = colors[i]
                row += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(row + "\n")


def read_ply_points(path: str) -> np.ndarray:
    with open(path) as f:
        n = 0
        for line in f:
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line.strip() == "end_header":
                break
        pts = [[float(x) for x in f.readline().split()[:3]]
               for _ in range(n)]
    return np.asarray(pts)
