"""Source-database deduplication via spectral clustering.

Capability port of reference ``engine/simple_cl.py`` (offline stage 4):
cluster the source parts by pairwise distance, iteratively refine
low-cohesion clusters, and keep one representative (medoid) per cluster —
producing the deduplicated source index the training pipeline consumes
(reference writes ``results.pickle``; we return / save the index array).
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import numpy as np


def affinity_from_distance(dist: np.ndarray, sigma: Optional[float] = None
                           ) -> np.ndarray:
    d = np.asarray(dist, np.float64)
    if sigma is None:
        sigma = np.median(d[d > 0]) + 1e-12
    a = np.exp(-(d ** 2) / (2.0 * sigma ** 2))
    np.fill_diagonal(a, 1.0)
    return (a + a.T) / 2.0


def spectral_cluster(dist: np.ndarray, n_clusters: int,
                     seed: int = 0) -> np.ndarray:
    from sklearn.cluster import SpectralClustering

    aff = affinity_from_distance(dist)
    sc = SpectralClustering(n_clusters=n_clusters, affinity="precomputed",
                            random_state=seed, assign_labels="discretize")
    return sc.fit_predict(aff)


def cluster_medoids(dist: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Representative (minimum total intra-cluster distance) per cluster."""
    medoids = []
    for c in np.unique(labels):
        members = np.where(labels == c)[0]
        sub = dist[np.ix_(members, members)]
        medoids.append(members[int(np.argmin(sub.sum(1)))])
    return np.asarray(medoids)


def cluster_cohesion(dist: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Mean intra-cluster distance per cluster."""
    out = []
    for c in np.unique(labels):
        members = np.where(labels == c)[0]
        if len(members) < 2:
            out.append(0.0)
            continue
        sub = dist[np.ix_(members, members)]
        out.append(float(sub.sum() / (len(members) * (len(members) - 1))))
    return np.asarray(out)


def refine_clusters(dist: np.ndarray, labels: np.ndarray,
                    cohesion_threshold: float,
                    max_rounds: int = 5, seed: int = 0) -> np.ndarray:
    """Iteratively split clusters whose mean intra-distance exceeds the
    threshold (the role of reference ``refine_cluster:111`` /
    ``clear_cluster:90``)."""
    labels = labels.copy()
    for _ in range(max_rounds):
        ids = np.unique(labels)
        coh = cluster_cohesion(dist, labels)
        bad = [c for c, co in zip(ids, coh) if co > cohesion_threshold]
        if not bad:
            break
        next_id = labels.max() + 1
        for c in bad:
            members = np.where(labels == c)[0]
            if len(members) < 2:
                continue
            sub = dist[np.ix_(members, members)]
            split = spectral_cluster(sub, 2, seed)
            labels[members[split == 1]] = next_id
            next_id += 1
    return labels


def deduplicate_sources(dist_src: np.ndarray, n_clusters: int,
                        cohesion_threshold: Optional[float] = None,
                        seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Full dedup pipeline: cluster -> refine -> medoid index.

    Returns (representative indices [K], cluster labels [S]).
    """
    labels = spectral_cluster(dist_src, n_clusters, seed)
    if cohesion_threshold is not None:
        labels = refine_clusters(dist_src, labels, cohesion_threshold,
                                 seed=seed)
    return cluster_medoids(dist_src, labels), labels


def save_dedup_index(path: str, index: np.ndarray) -> None:
    with open(path, "wb") as f:
        pickle.dump(np.asarray(index), f)


def load_dedup_index(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f))


def main(argv):
    """``python -m ured_tpu.data.clustering config.json [n_clusters]`` — the
    role of reference ``engine/simple_cl.py``: spectral-cluster the
    source-part similarity matrix, refine, and save the deduplicated
    representative index (``results.pickle`` analogue)."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data import corpus
    from ured_tpu.data.partnet import load_sources
    from ured_tpu.data.pairs import source_pair_matrix

    cfg = URedConfig.from_json(argv[1]) if len(argv) > 1 else URedConfig()
    if not corpus.real_data_available(cfg):
        print("no PartNet-layout tree at the configured paths; nothing to do")
        return
    # ALWAYS cluster the full source list: with extras.dedup_index enabled
    # (consuming this CLI's own output), loading deduped sources here would
    # write subset-relative indices that the next load misapplies to the
    # full datasplit list
    cfg.extras.pop("dedup_index", None)
    source_db = load_sources(cfg)
    dist_src = source_db.dist_src
    if dist_src is None:
        dist_src = source_pair_matrix(source_db.points)
    n_clusters = int(argv[2]) if len(argv) > 2 else max(
        2, dist_src.shape[0] // 4)
    index, labels = deduplicate_sources(
        dist_src, n_clusters,
        cohesion_threshold=cfg.extras.get("cohesion_threshold"))
    import os

    out = os.path.join(cfg.base_dir, "dedup_index.pickle")
    save_dedup_index(out, index)
    print(f"dedup: {dist_src.shape[0]} sources -> {len(index)} "
          f"representatives ({out})")


if __name__ == "__main__":
    import sys

    main(sys.argv)


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)
