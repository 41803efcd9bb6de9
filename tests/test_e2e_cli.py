"""Hermetic end-to-end CLI path on a generated PartNet-layout tree.

Exercises the flagship real-data contract (reference
``engine/train.py:156-204`` + ``README.md:23-25``): preprocess box shapes
into per-part h5s -> generate splits + combined target h5 -> (pair archive
built on device by the train CLI itself) -> ``python -m
ured_tpu.engine.train cfg.json`` -> ``python -m ured_tpu.engine.evaluate
cfg.json`` — no synthetic corpus involved, no external data.
"""

import json
import os

import h5py
import numpy as np
import pytest

from ured_tpu.data import preprocessing
from ured_tpu.data.splits import generate_splits_and_h5
from ured_tpu.data.vocab import label_id

pytestmark = pytest.mark.slow  # end-to-end / multi-process tier: run the core loop with -m 'not slow'


NPP = 32  # points per part; 2 parts -> 64-point targets


def _box_mesh(scale, offset):
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float64) * scale + offset
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("partnet_tree")
    src_dir = base / "data_aabb_all_models" / "chair" / "h5"
    shapes_dir = base / "shapes"
    os.makedirs(shapes_dir)
    rng = np.random.default_rng(0)

    hier = {"id": 0, "label": "chair",
            "children": [{"id": 1, "label": "chair_seat"},
                         {"id": 2, "label": "chair_back"}]}
    hp = str(base / "hier.json")
    with open(hp, "w") as f:
        json.dump(hier, f)

    for m in range(6):
        s1 = rng.uniform(0.5, 1.0, 3)
        v1, f1 = _box_mesh(s1, np.zeros(3))
        # second box shares the x = s1[0] face -> connectivity detected
        v2, f2 = _box_mesh(rng.uniform(0.5, 1.0, 3),
                           np.array([s1[0], 0.0, 0.0]))
        parts, _, _ = preprocessing.process_shape(
            hp, None, None, points_per_part=NPP,
            meshes=[(v1, f1), (v2, f2)], adjacency_tol=0.1)
        preprocessing.save_parts(str(src_dir), str(m), parts)

        pts = np.concatenate([p.points for p in parts]).astype(np.float32)
        labels = np.repeat(np.arange(len(parts)), NPP).astype(np.int32)
        sems = np.concatenate(
            [[label_id(p.label)] * NPP for p in parts]).astype(np.int32)
        with h5py.File(str(shapes_dir / f"{m}.h5"), "w") as f:
            f["all_points"] = pts
            f["all_point_labels"] = labels
            f["point_semantic"] = sems

    out = generate_splits_and_h5(
        "chair", 2, str(src_dir), str(shapes_dir),
        str(base / "generated_datasplits"), seed=0)
    assert os.path.exists(out["train"]) and os.path.exists(out["test"])
    return base


def _cfg_dict(base, log_path, mode):
    return {
        "base_dir": str(base), "category": "chair", "num_source": 2,
        "mode": mode, "MAX_NUM_PARTS": 4, "num_target_points": 2 * NPP,
        "num_part_points": NPP, "sem_latent_dim": 8,
        "source_latent_dim": 16, "target_latent_dim": 16,
        "part_latent_dim": 16, "epochs": 2, "save_epoch": 1,
        "batch_size": 2 if mode == "train" else 1,
        "log_path": str(log_path), "random_rot": True,
    }


def test_train_cli_on_fixture_tree(fixture_tree, tmp_path, capsys):
    from ured_tpu.engine import train as train_mod

    log = tmp_path / "log"
    cfg_path = str(tmp_path / "cfg_train.json")
    with open(cfg_path, "w") as f:
        json.dump(_cfg_dict(fixture_tree, log, "train"), f)

    train_mod.main(["train", cfg_path])

    out = capsys.readouterr().out
    assert "loading PartNet corpus" in out       # real-data path, no fallback
    # pair archive materialized by the CLI itself (stage-3 replacement)
    assert os.path.exists(
        str(fixture_tree / "pairs" / "chair_2_train_pairs.npz"))
    # config snapshot (ref train.py:367) + per-epoch checkpoints
    assert os.path.exists(str(log / "config.json"))
    assert os.listdir(str(log / "checkpoints"))


def test_evaluate_cli_on_fixture_tree(fixture_tree, tmp_path):
    from ured_tpu.engine import evaluate as eval_mod

    cfg_path = str(tmp_path / "cfg_test.json")
    d = _cfg_dict(fixture_tree, tmp_path / "log_eval", "test")
    d["ndcg_sigma"] = 0.5  # fixture DCD rows are O(0.1): keep relevance > 0
    with open(cfg_path, "w") as f:
        json.dump(d, f)

    metrics = eval_mod.main(["evaluate", cfg_path])
    for key in ("best_full_cd_loss", "best_full_re_loss", "ndcg@40"):
        assert np.isfinite(metrics[key])
    assert metrics["ndcg@40"] > 0.0


def test_pair_archive_reused_not_rebuilt(fixture_tree):
    """Second corpus load must consume the cached npz, not recompute."""
    from unittest import mock

    from ured_tpu.config import URedConfig
    from ured_tpu.data import corpus

    cfg = URedConfig.from_dict(_cfg_dict(fixture_tree, "/tmp/x", "train"))
    with mock.patch("ured_tpu.data.pairs.pair_distance_matrix",
                    side_effect=AssertionError("should hit the cache")):
        c = corpus.from_partnet(cfg)
    assert c.pair_dist.shape[0] == len(c)
    assert (c.label_table >= -1).all()
    # every valid part got a pseudo-label drawn from the source DB
    valid = c.label_table >= 0
    assert valid.any()
    assert c.label_table[valid].max() < c.src_points.shape[0]


def test_vis_cli_on_fixture_tree(fixture_tree, tmp_path):
    from ured_tpu.engine import vis as vis_mod

    cfg_path = str(tmp_path / "cfg_vis.json")
    d = _cfg_dict(fixture_tree, tmp_path / "log_vis", "test")
    with open(cfg_path, "w") as f:
        json.dump(d, f)

    out_dir = str(tmp_path / "vis_out")
    metrics = vis_mod.main(["vis", cfg_path, out_dir])
    assert np.isfinite(metrics["best_full_cd_loss"])
    exported = os.listdir(out_dir)
    assert exported, "vis CLI must export per-target assemblies"
    # mesh payloads present in the fixture tree -> OBJ assemblies
    assert any(n.endswith((".obj", ".ply")) for n in exported)


def test_pairs_cli_on_fixture_tree(fixture_tree, capsys):
    import json as _json
    import tempfile

    from ured_tpu.data import pairs as pairs_mod

    with tempfile.TemporaryDirectory() as td:
        cfg_path = os.path.join(td, "cfg.json")
        with open(cfg_path, "w") as f:
            _json.dump(_cfg_dict(fixture_tree, td, "train"), f)
        pairs_mod.main(["pairs", cfg_path])
    out = capsys.readouterr().out
    assert "pair archive:" in out


def test_clustering_cli_on_fixture_tree(fixture_tree, capsys):
    import json as _json
    import tempfile

    from ured_tpu.data import clustering as cl_mod

    with tempfile.TemporaryDirectory() as td:
        cfg_path = os.path.join(td, "cfg.json")
        with open(cfg_path, "w") as f:
            _json.dump(_cfg_dict(fixture_tree, td, "train"), f)
        cl_mod.main(["cl", cfg_path, "2"])
    out = capsys.readouterr().out
    assert "representatives" in out
    assert os.path.exists(str(fixture_tree / "dedup_index.pickle"))


def test_preprocessing_cli(tmp_path, capsys):
    import json as _json

    hier = {"id": 0, "label": "chair",
            "children": [{"id": 1, "label": "chair_seat", "objs": ["1"]}]}
    hp = str(tmp_path / "hier.json")
    with open(hp, "w") as f:
        _json.dump(hier, f)
    # obj-dir layout: one mesh file per leaf node id
    od = tmp_path / "objs"
    os.makedirs(str(od))
    v, f_ = _box_mesh(np.ones(3), np.zeros(3))
    with open(str(od / "1.obj"), "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f_ + 1:
            fh.write(f"f {a} {b} {c}\n")
    specs = [{"model_id": "m0", "hier_json": hp, "obj_dir": str(od)}]
    sp = str(tmp_path / "specs.json")
    with open(sp, "w") as f:
        _json.dump(specs, f)
    out_dir = str(tmp_path / "out")

    from ured_tpu.data import preprocessing as prep_mod

    prep_mod.main(["prep", sp, out_dir, "1"])
    assert "processed 1 shapes" in capsys.readouterr().out
    assert os.listdir(out_dir)


def test_reference_scale_micro_chain(tmp_path, monkeypatch):
    """The benchmark chain script itself (benchmarks/reference_scale.py) at
    micro scale: generate -> export -> pair archives -> train -> evaluate
    -> vis in one process, plus its restart behaviors (scale-stamped
    generate/export skip; per-stage timings carried across attempts)."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "reference_scale", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "reference_scale.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.chdir(str(tmp_path))
    # hermetic: the chain's stage children must not touch the session's
    # remote TPU backend from CI (and must not race a live full-scale chain)
    monkeypatch.setenv("URED_CHAIN_CPU", "1")
    out_json = str(tmp_path / "chain.json")
    base = str(tmp_path / "tree")
    argv = ["reference_scale", out_json, "--smoke",
            "--targets", "10", "--sources", "8", "--points", "64",
            "--ppp", "16", "--bs", "2", "--epochs", "1", "--base", base]
    mod.main(argv)
    with open(out_json) as f:
        res = json.load(f)
    assert res["scale"] == {"targets": 10, "sources": 8, "epochs": 1,
                            "train_on_partial": False}
    for st in ("generate", "export_tree", "pair_archive_train",
               "pair_archive_test", "train", "evaluate", "vis"):
        assert st in res["stage_seconds"], st
    assert np.isfinite(res["metrics"]["best_full_cd_loss"])
    assert res["metrics"]["best_full_cd_loss"] >= 0
    # liveness heartbeat: the evidence alone must say the chain finished
    assert res["heartbeat"]["stage"] == "complete"
    # micro-scale generate can round to 0.0 s; the carried-timing check
    # below is the real restart property
    gen_t = res["stage_seconds"]["generate"]
    assert res["stage_seconds"]["train"] > 0

    # "restart": generate/export skip via the sentinel, timings carried
    mod.main(argv)
    with open(out_json) as f:
        res2 = json.load(f)
    assert res2["stage_seconds"]["generate"] == gen_t  # carried, not 0
    assert os.path.exists(os.path.join(base, ".export_done"))

    # --partial variant: shares the exported tree + pair archives (the
    # fingerprint cache short-circuits the pair stages), but gets its own
    # log dir, stage sentinels and evidence JSON
    out_partial = str(tmp_path / "chain_partial.json")
    mod.main(argv[:1] + [out_partial, "--partial"] + argv[2:])
    with open(out_partial) as f:
        resp = json.load(f)
    assert resp["scale"]["train_on_partial"] is True
    assert np.isfinite(resp["metrics"]["best_full_cd_loss"])
    # separate training run (own checkpoints), shared pair archives
    assert os.path.exists(os.path.join(base, "log_partial", "checkpoints"))
    assert os.path.isdir(os.path.join(base, ".stage_done_partial"))
    # the full-target chain's sentinels were not clobbered
    with open(os.path.join(base, ".stage_done", "train")) as f:
        assert f.read().strip()
