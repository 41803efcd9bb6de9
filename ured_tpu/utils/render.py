"""Headless point-cloud / mesh snapshot rendering.

Replaces the reference's shell-out to an external OSMesa binary
(``dataset/dataset_utils.py:154-167``, ``engine/run_preprocessing.py:
684-722``, ``engine/global_variables.py:g_renderer``) with matplotlib-Agg
renders — no GPU, no external binary, same role: quick PNG snapshots of
clouds/parts for QA, with the reference's default camera angles
(azimuth -70, elevation 20; ``global_variables.py:14-16``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def render_point_cloud(points: np.ndarray, out_path: str,
                       labels: Optional[np.ndarray] = None,
                       azimuth_deg: float = -70.0,
                       elevation_deg: float = 20.0,
                       point_size: float = 2.0,
                       figsize: float = 4.0) -> str:
    """Snapshot a (part-colored) cloud to PNG.  Returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    fig = plt.figure(figsize=(figsize, figsize))
    ax = fig.add_subplot(111, projection="3d")
    c = None
    if labels is not None:
        c = np.asarray(labels)
    ax.scatter(pts[:, 0], pts[:, 2], pts[:, 1], s=point_size, c=c,
               cmap="tab20", linewidths=0)
    ax.view_init(elev=elevation_deg, azim=azimuth_deg)
    ax.set_axis_off()
    lim = np.abs(pts).max() or 1.0
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-lim, lim)
    fig.tight_layout(pad=0)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def render_comparison(clouds: Sequence[np.ndarray], out_path: str,
                      titles: Optional[Sequence[str]] = None,
                      azimuth_deg: float = -70.0,
                      elevation_deg: float = 20.0) -> str:
    """Side-by-side snapshots (the reference's source-vs-deformed pairs,
    ``dataset_utils.py:render_point_cloud... output_visualization``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(clouds)
    fig = plt.figure(figsize=(4 * n, 4))
    for i, pc in enumerate(clouds):
        pts = np.asarray(pc)
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        ax.scatter(pts[:, 0], pts[:, 2], pts[:, 1], s=2, linewidths=0)
        ax.view_init(elev=elevation_deg, azim=azimuth_deg)
        ax.set_axis_off()
        if titles:
            ax.set_title(titles[i])
    fig.tight_layout(pad=0)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


class AverageValueMeter:
    """Streaming mean/std meter (the vendored trainer's metric meter,
    ``Density_aware_Chamfer_Distance/utils/train_utils.py``)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.n = 0
        self.sum = 0.0
        self.sum_sq = 0.0

    def update(self, value: float, n: int = 1) -> None:
        self.n += n
        self.sum += float(value) * n
        self.sum_sq += float(value) ** 2 * n

    @property
    def avg(self) -> float:
        return self.sum / max(self.n, 1)

    @property
    def std(self) -> float:
        if self.n < 2:
            return 0.0
        var = self.sum_sq / self.n - self.avg ** 2
        return float(np.sqrt(max(var, 0.0)))
