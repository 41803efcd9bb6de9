"""Dataset split generation (offline stage 2).

Capability port of reference ``engine/generate_combined_h5.py``: pick the
source models (optionally seeded from a preselected list), carve the
remaining targets into train/test splits, and pack each split's whole-shape
point clouds into one combined h5.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from ured_tpu.data import io


def collect_sources_and_target_splits(
        source_model_ids: Sequence[str],
        target_model_ids: Sequence[str],
        num_sources: int = -1,
        preselected_sources: Optional[Sequence[str]] = None,
        split_ratio: float = 0.8,
        seed: int = 0) -> Dict[str, list]:
    """Select sources + train/test target splits
    (reference ``collect_sources_and_target_splits:136-203``).

    ``num_sources < 0`` uses the reference's default of 10% of the targets.
    Sources are removed from the target pool; remaining targets split
    train/test by ``split_ratio``.
    """
    rng = np.random.default_rng(seed)
    sources = list(preselected_sources or [])
    targets = [t for t in target_model_ids if t not in set(sources)]

    if num_sources < 0:
        num_sources = int(0.1 * len(target_model_ids))

    pool = sorted(set(source_model_ids) - set(sources))
    order = rng.permutation(len(pool))
    for i in order:
        if len(sources) >= num_sources:
            break
        sources.append(pool[i])

    targets = [t for t in targets if t not in set(sources)]
    idx = rng.permutation(len(targets))
    cut = int(split_ratio * len(targets))
    train = [targets[i] for i in idx[:cut]]
    test = [targets[i] for i in idx[cut:]]
    return {"sources": sources, "train": train, "test": test}


def pack_targets_h5(model_ids: Sequence[str], shapes_dir: str,
                    out_path: str,
                    loader=None) -> int:
    """Pack whole-shape samples into a combined target h5 (reference
    ``get_targets_h5:84-128``): per model, (points [N, 3], part labels [N],
    semantics [N]).

    ``loader(model_id) -> (points, labels, semantics)`` may override the
    default h5-per-shape reader; missing models are skipped like the
    reference.  Returns the number of packed models.
    """
    import h5py

    pts, labs, sems, ids = [], [], [], []
    for model in model_ids:
        if loader is not None:
            rec = loader(model)
            if rec is None:
                continue
            p, l, s = rec
        else:
            path = os.path.join(shapes_dir, f"{model}.h5")
            if not os.path.exists(path):
                print(f"{path} does not exist.")
                continue
            with h5py.File(path, "r") as f:
                p = f["all_points"][:] if "all_points" in f \
                    else f["points"][:]
                l = f["all_point_labels"][:] if "all_point_labels" in f \
                    else f["point_labels"][:]
                s = f["point_semantic"][:] if "point_semantic" in f \
                    else np.zeros(len(p), np.int32)
        pts.append(p)
        labs.append(l)
        sems.append(s)
        ids.append(model)
    if not pts:
        return 0
    io.save_targets_h5(out_path, np.stack(pts), np.stack(labs),
                       np.stack(sems), np.asarray(ids))
    return len(pts)


def generate_splits_and_h5(category: str, num_sources: int,
                           source_dir: str, target_dir: str,
                           dump_dir: str, seed: int = 0,
                           loader=None) -> Dict[str, str]:
    """Full stage-2 driver (reference ``__main__:204-237``): write the
    datasplit pickle plus train/test combined h5 files; returns the paths."""
    os.makedirs(dump_dir, exist_ok=True)
    src_ids = sorted({f.split("_")[0] for f in os.listdir(source_dir)
                      if f.endswith(".h5")})
    tgt_ids = sorted({f.split(".")[0].split("_")[0]
                      for f in os.listdir(target_dir) if f.endswith(".h5")})
    splits = collect_sources_and_target_splits(
        src_ids, tgt_ids, num_sources, seed=seed)

    pickle_path = os.path.join(dump_dir,
                               f"{category}_{num_sources}.pickle")
    source_parts = [f[:-3] for f in os.listdir(source_dir)
                    if f.endswith(".h5")
                    and f.split("_")[0] in set(splits["sources"])]
    io.save_datasplits(pickle_path, splits["sources"], splits["train"],
                       splits["test"], sources_part=source_parts)

    out = {"pickle": pickle_path}
    for name in ("train", "test"):
        h5_path = os.path.join(
            dump_dir, f"{category}_{num_sources}_{name}.h5")
        pack_targets_h5(splits[name], target_dir, h5_path, loader=loader)
        out[name] = h5_path
    return out


def main(argv):
    """``python -m ured_tpu.data.splits category num_sources source_dir
    target_dir dump_dir [seed]`` — the role of reference
    ``engine/generate_combined_h5.py`` (``__main__:204-237``)."""
    if len(argv) < 6:
        print(main.__doc__)
        return
    out = generate_splits_and_h5(
        argv[1], int(argv[2]), argv[3], argv[4], argv[5],
        seed=int(argv[6]) if len(argv) > 6 else 0)
    for k, v in out.items():
        print(f"{k}: {v}")


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)


if __name__ == "__main__":
    import sys

    main(sys.argv)
