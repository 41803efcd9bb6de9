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


def pairwise_sqdist_np(pts1: np.ndarray, pts2: np.ndarray) -> np.ndarray:
    """Dense squared-distance matrix [N1, N2] (reference
    ``calculate_two_pts_distance:337``)."""
    a = np.sum(pts1 ** 2, axis=1)[:, None]
    b = np.sum(pts2 ** 2, axis=1)[None, :]
    return a + b - 2.0 * pts1 @ pts2.T


def rotate_pts(pts: np.ndarray, theta: float = 0.0,
               phi: float = 0.0) -> np.ndarray:
    """Y-then-X-axis rotation with the reference's angle conventions
    (``rotate_pts:96``: phi in [-90, 90] maps to +-pi/2 about x, theta in
    degrees about y)."""
    out = np.asarray(pts, np.float32)
    a = phi / 90.0 * np.pi / 2.0
    rx = np.array([[1, 0, 0],
                   [0, np.cos(a), np.sin(a)],
                   [0, -np.sin(a), np.cos(a)]], np.float32)
    out = out @ rx
    a = theta / 360.0 * 2.0 * np.pi
    ry = np.array([[np.cos(a), 0, np.sin(a)],
                   [0, 1, 0],
                   [-np.sin(a), 0, np.cos(a)]], np.float32)
    return out @ ry


def propagate_pts_seg(ori_pts: np.ndarray, ori_seg: np.ndarray,
                      tar_pts: np.ndarray) -> np.ndarray:
    """Nearest-neighbor segmentation transfer between point clouds
    (reference ``propagate_pts_seg_from_another_pts:344``)."""
    idx = np.argmin(pairwise_sqdist_np(ori_pts, tar_pts), axis=0)
    return np.asarray(ori_seg)[idx]


def transfer_label_to_faces(vertices: np.ndarray, faces: np.ndarray,
                            pts: np.ndarray,
                            label: np.ndarray) -> np.ndarray:
    """Per-face labels from the labeled point nearest each face center
    (reference ``transfer_label_from_pts_to_obj:262``; faces 0-based here
    — our OBJ reader is 0-based)."""
    assert pts.shape[0] == label.shape[0], "#pts != #label"
    centers = vertices[faces].mean(axis=1)          # [F, 3]
    nearest = np.argmin(pairwise_sqdist_np(pts, centers), axis=0)
    return np.asarray(label)[nearest]


def mesh_connected_components(faces: np.ndarray,
                              face_labels: np.ndarray = None) -> np.ndarray:
    """Per-face connected-component ids over shared-edge adjacency
    (reference ``detect_connected_component:281``; faces 0-based).  Faces
    join a component only through edges whose two faces carry the same
    ``face_labels`` entry when labels are given.  Vectorized: edges are
    grouped with one lexsort instead of a python dict, components come
    from scipy's union-find."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as _cc

    f = np.asarray(faces, np.int64)
    nf = f.shape[0]
    tri = np.sort(f, axis=1)
    # the 3 undirected edges of each face
    edges = np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]],
                            tri[:, [0, 2]]], axis=0)      # [3F, 2]
    owner = np.tile(np.arange(nf), 3)
    # sort by (edge, label) so that on a non-manifold edge shared by 3+
    # faces, same-label owners are consecutive — consecutive-pair linking
    # then chains them transitively even when another label interleaves
    if face_labels is not None:
        lab = np.asarray(face_labels)
        order = np.lexsort((lab[owner], edges[:, 1], edges[:, 0]))
    else:
        order = np.lexsort((edges[:, 1], edges[:, 0]))
    edges, owner = edges[order], owner[order]
    same = (edges[1:] == edges[:-1]).all(axis=1)
    a, b = owner[:-1][same], owner[1:][same]
    if face_labels is not None:
        keep = lab[a] == lab[b]
        a, b = a[keep], b[keep]
    adj = coo_matrix((np.ones(len(a)), (a, b)), shape=(nf, nf))
    _, comp = _cc(adj, directed=False)
    return comp.astype(np.int32)


def remove_isolated_vertices(vertices: np.ndarray, faces: np.ndarray):
    """Drop vertices referenced by no face and reindex faces (reference
    ``remove_isolated_vertices:349``; 0-based)."""
    used = np.zeros(vertices.shape[0], bool)
    used[np.asarray(faces).ravel()] = True
    remap = np.cumsum(used) - 1
    return vertices[used], remap[np.asarray(faces)]
