"""Data-layer tests: I/O roundtrips, pair generation, preprocessing,
clustering, dataset plumbing."""

import json
import os

import numpy as np
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.data import io, pairs, preprocessing
from ured_tpu.data.clustering import deduplicate_sources
from ured_tpu.data.parametric import aabbox_of_points, get_default_param
from ured_tpu.data.partnet import PartNetDataset, SourceDB, load_sources
from ured_tpu.data.vocab import LABEL_TO_IDX, label_id


def test_part_h5_roundtrip(tmp_path, rng):
    part = io.PartModel(
        box_params=rng.normal(size=12),
        default_param=rng.normal(size=6),
        points=rng.normal(size=(32, 3)).astype(np.float32),
        points_mat=rng.normal(size=(96, 6)).astype(np.float32),
        sem_label="chair/chair_back/back_surface",
        vertices=rng.normal(size=(10, 3)),
        vertices_mat=rng.normal(size=(30, 6)),
        faces=rng.integers(0, 10, size=(12, 3)),
    )
    p = str(tmp_path / "x_0.h5")
    io.save_part_h5(p, part)
    back = io.load_part_h5(p)
    np.testing.assert_allclose(back.points, part.points)
    assert back.sem_label == part.sem_label
    assert back.faces.shape == (12, 3)


def test_targets_h5_and_splits_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(3, 16, 3)).astype(np.float32)
    lab = rng.integers(0, 4, size=(3, 16))
    sem = rng.integers(0, 42, size=(3, 16))
    ids = np.arange(3)
    p = str(tmp_path / "targets.h5")
    io.save_targets_h5(p, pts, lab, sem, ids)
    d, l, s, m = io.load_targets_h5(p)
    np.testing.assert_allclose(d, pts)

    sp = str(tmp_path / "splits.pickle")
    io.save_datasplits(sp, ["a", "b"], ["c"], ["d"])
    src, train, test = io.load_datasplits(sp)
    assert src == ["a", "b"] and train == ["c"] and test == ["d"]


def test_obj_roundtrip(tmp_path, rng):
    v = rng.normal(size=(5, 3))
    f = np.array([[0, 1, 2], [2, 3, 4]])
    p = str(tmp_path / "m.obj")
    io.write_obj(p, v, f)
    v2, f2 = io.read_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_vocab():
    assert len(LABEL_TO_IDX) == 42
    assert label_id("chair/chair_back/back_surface") == \
        LABEL_TO_IDX["back_surface"]


def test_pair_matrix_matches_direct(rng):
    q = rng.normal(size=(5, 24, 3)).astype(np.float32)
    s = rng.normal(size=(7, 24, 3)).astype(np.float32)
    out = pairs.pair_distance_matrix(q, s, chunk_q=2, chunk_s=3)
    # direct single-pair computation for a few spot checks
    import jax.numpy as jnp

    from ured_tpu.ops.dcd import calc_dcd

    for (i, j) in [(0, 0), (4, 6), (2, 5)]:
        dcd, cd_p, cd_t = calc_dcd(jnp.asarray(q[i:i + 1]),
                                   jnp.asarray(s[j:j + 1]))
        np.testing.assert_allclose(out["dcd"][i, j], float(dcd[0]), rtol=1e-4)
        np.testing.assert_allclose(out["cd_m"][i, j], float(cd_t[0]),
                                   rtol=1e-4)


def test_pair_matrix_resume_matches_fresh(tmp_path, rng):
    q = rng.normal(size=(6, 16, 3)).astype(np.float32)
    s = rng.normal(size=(5, 16, 3)).astype(np.float32)
    fresh = pairs.pair_distance_matrix(q, s, chunk_q=2, chunk_s=2)

    # simulate a job killed after 1 of 3 row blocks: run fully, then rewind
    # the marker and corrupt the un-marked rows — the resumed run must
    # recompute exactly those rows
    rdir = str(tmp_path / "partial")
    pairs.pair_distance_matrix(q, s, chunk_q=2, chunk_s=2, resume_dir=rdir)
    (tmp_path / "partial" / "rows_done").write_text("1")
    for k in ("dcd", "cd_s", "cd_m"):
        m = np.lib.format.open_memmap(str(tmp_path / "partial" / f"{k}.npy"),
                                      mode="r+")
        m[2:] = -777.0
        del m
    resumed = pairs.pair_distance_matrix(q, s, chunk_q=2, chunk_s=2,
                                         resume_dir=rdir)
    for k in fresh:
        np.testing.assert_allclose(resumed[k], fresh[k], rtol=1e-5)
        assert not np.any(resumed[k] == -777.0)


def test_dist_src_cache_invalidates_on_source_change(tmp_path):
    """The [S, S] dist_src cache is keyed by a content fingerprint of the
    source clouds: a regenerated source set of the SAME size must recompute
    instead of silently reusing the stale matrix."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data.corpus import build_pair_archive

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    labels = np.zeros((2, 32), np.int64)
    src_a = rng.normal(size=(3, 16, 3)).astype(np.float32)
    src_b = rng.normal(size=(3, 16, 3)).astype(np.float32)  # same shape

    cfg = URedConfig(base_dir=str(tmp_path), category="chair",
                     num_source=3, MAX_NUM_PARTS=2)
    arch_a = build_pair_archive(cfg, pts, labels, src_a,
                                chunk_q=2, chunk_s=2)
    arch_b = build_pair_archive(cfg, pts, labels, src_b,
                                chunk_q=2, chunk_s=2)
    assert not np.allclose(arch_a["dist_src"], arch_b["dist_src"])
    # and a repeat with the SAME sources hits the cache exactly
    arch_b2 = build_pair_archive(cfg, pts, labels, src_b,
                                 chunk_q=2, chunk_s=2)
    np.testing.assert_array_equal(arch_b["dist_src"], arch_b2["dist_src"])


def test_pair_archive_cache_invalidates_on_corpus_change(tmp_path):
    """The npz pair-archive cache carries a corpus fingerprint: the same
    cache path with changed targets/sources recomputes; unchanged inputs
    hit the cache (and no 'fingerprint' key leaks to consumers)."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data.corpus import build_pair_archive

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    pts2 = rng.normal(size=(2, 32, 3)).astype(np.float32)
    labels = np.zeros((2, 32), np.int64)
    src = rng.normal(size=(3, 16, 3)).astype(np.float32)
    cfg = URedConfig(base_dir=str(tmp_path), category="chair",
                     num_source=3, MAX_NUM_PARTS=2)
    cache = str(tmp_path / "arch.npz")
    a1 = build_pair_archive(cfg, pts, labels, src, cache_path=cache,
                            chunk_q=2, chunk_s=2)
    assert "fingerprint" not in a1
    a1b = build_pair_archive(cfg, pts, labels, src, cache_path=cache,
                             chunk_q=2, chunk_s=2)
    assert "fingerprint" not in a1b
    np.testing.assert_array_equal(a1["cd_m"], a1b["cd_m"])
    a2 = build_pair_archive(cfg, pts2, labels, src, cache_path=cache,
                            chunk_q=2, chunk_s=2)
    assert not np.allclose(a1["cd_m"], a2["cd_m"])


def test_build_label_table_semantics():
    # 2 targets x 2 parts, 4 sources; distances crafted so that:
    # part (0,0): nearest source 1 is wrong-sem, source 0 right-sem -> 0
    cd_m = np.zeros((2, 2, 4), np.float32)
    cd_m[0, 0] = [0.005, 0.001, 0.5, 0.5]
    cd_m[0, 1] = [0.5, 0.5, 0.003, 0.5]
    cd_m[1, 0] = [0.5, 0.5, 0.5, 0.004]
    cd_m[1, 1] = [0.9, 0.9, 0.9, 0.9]   # nothing under threshold
    part_valid = np.array([[1, 1], [1, 1]], np.float32)
    part_sems = np.array([[10, 11], [12, 12]], np.int32)
    source_sems = np.array([10, 99, 11, 12], np.int32)
    table = pairs.build_label_table(
        cd_m, part_valid, part_sems, source_sems,
        threshold=0.02, dist_src=None, cl_k=2)
    assert table[0, 0] == 0          # semantic match preferred
    assert table[0, 1] == 2
    assert table[1, 0] == 3
    assert table[1, 1] == 0          # fallback: global nearest (index 0)


def test_label_table_similarity_mask():
    # two parts of one target pick sources 0 and 1 which are mutual top-k
    # neighbors -> the second gets masked
    cd_m = np.zeros((1, 2, 3), np.float32)
    cd_m[0, 0] = [0.001, 0.5, 0.9]
    cd_m[0, 1] = [0.5, 0.001, 0.9]
    part_valid = np.ones((1, 2), np.float32)
    part_sems = np.array([[5, 5]], np.int32)
    source_sems = np.array([5, 5, 5], np.int32)
    dist_src = np.array([[0.0, 0.01, 10.0],
                         [0.01, 0.0, 10.0],
                         [10.0, 10.0, 0.0]], np.float32)
    # cl_k=2 because each source's top-1 neighbor is itself (distance 0),
    # exactly as in the reference's dist_src matrices
    table = pairs.build_label_table(
        cd_m, part_valid, part_sems, source_sems,
        threshold=0.02, dist_src=dist_src, cl_k=2)
    assert table[0, 0] == 0
    assert table[0, 1] == -1


def _box_mesh():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


def test_preprocess_shape_roundtrip(tmp_path):
    # two touching unit boxes -> connectivity detected, A @ x0 == points
    v1, f1 = _box_mesh()
    v2 = v1 + np.array([1.0, 0, 0])  # shares the x=1 face
    hier = {"id": 0, "label": "chair",
            "children": [{"id": 1, "label": "chair_seat"},
                         {"id": 2, "label": "chair_back"}]}
    hp = str(tmp_path / "h.json")
    with open(hp, "w") as f:
        json.dump(hier, f)

    parts, c, proj = preprocessing.process_shape(
        hp, None, None, points_per_part=256,
        meshes=[(v1, f1), (v2, f1)], adjacency_tol=0.1)
    assert len(parts) == 2
    for p in parts:
        rec = (p.points_mat @ p.default_param).reshape(-1, 3)
        np.testing.assert_allclose(rec, p.points, atol=1e-10)
        # sampled points lie inside the part's AABB
        box = p.box
        lo = box[:3] - box[3:6] / 2 - 1e-9
        hi = box[:3] + box[3:6] / 2 + 1e-9
        assert (p.points >= lo).all() and (p.points <= hi).all()
    # the two boxes touch -> at least one joint constraint
    assert c.shape[0] >= 3
    # projector is idempotent and respects C @ proj ~ 0
    np.testing.assert_allclose(proj @ proj, proj, atol=1e-8)
    np.testing.assert_allclose(c @ proj, 0.0, atol=1e-8)

    paths = preprocessing.save_parts(str(tmp_path / "h5"), "42", parts)
    assert len(paths) == 2
    labels = {io.load_part_h5(p).sem_label for p in paths}
    assert labels == {"chair/chair_seat", "chair/chair_back"}


def test_keypoints_and_separating_axis():
    box = np.zeros(12)
    box[3:6] = [2.0, 4.0, 6.0]
    box[6:9] = [1, 0, 0]
    box[9:12] = [0, 1, 0]
    kps = preprocessing.box_keypoints(box)
    assert kps.shape == (26, 3)
    assert np.abs(kps).max() == 3.0  # half of the largest extent
    p1 = np.array([[0, 0, 0], [1, 1, 1.0]])
    p2 = np.array([[0, 0, 2.0], [1, 1, 3.0]])
    assert preprocessing.separating_axis(p1, p2) == 2


def test_clustering_dedup():
    # three tight groups of 4 -> 3 medoids, one per group
    rng = np.random.default_rng(0)
    base = np.repeat(np.array([[0.0], [10.0], [20.0]]), 4, axis=0)
    x = base + 0.1 * rng.normal(size=(12, 1))
    dist = np.abs(x - x.T)
    reps, labels = deduplicate_sources(dist, n_clusters=3)
    assert len(reps) == 3
    groups = {tuple(sorted(np.where(labels == c)[0]))
              for c in np.unique(labels)}
    assert groups == {(0, 1, 2, 3), (4, 5, 6, 7), (8, 9, 10, 11)}


def test_partnet_dataset_from_h5(tmp_path, rng):
    cfg = URedConfig(base_dir=str(tmp_path), category="chair", num_source=4,
                     MAX_NUM_PARTS=4)
    os.makedirs(str(tmp_path / "generated_datasplits"))
    pts = rng.normal(size=(6, 32, 3)).astype(np.float32)
    lab = rng.integers(0, 3, size=(6, 32))
    sem = rng.integers(0, 42, size=(6, 32))
    io.save_targets_h5(
        str(tmp_path / "generated_datasplits" / "chair_4_train.h5"),
        pts, lab, sem, np.arange(6))
    ds = PartNetDataset.from_h5(cfg)
    assert len(ds) == 6
    batches = list(ds.batches(4, np.random.default_rng(0)))
    assert len(batches) == 1
    assert batches[0]["x"].shape == (4, 32, 3)

    # with a label table + source db, batches carry source tensors
    db = SourceDB(
        points=rng.normal(size=(4, 16, 3)).astype(np.float32),
        mats=rng.normal(size=(4, 48, 6)).astype(np.float32),
        default_params=rng.normal(size=(4, 6)).astype(np.float32),
        sem_ids=np.zeros(4, np.int32), sem_labels=["leg"] * 4,
        model_ids=["a", "b", "c", "d"])
    table = rng.integers(-1, 4, size=(6, 4))
    ds.attach_label_table(table)
    batch = ds.make_batch(np.arange(2), db)
    assert batch["src_points"].shape == (2, 4, 16, 3)
    assert batch["src_valid"].shape == (2, 4)


def test_load_sources_dedup_index(tmp_path):
    """The ``dedup_index`` extra subsets the source DB to the clustering
    CLI's representatives — the reference's live consumption of
    results.pickle (``generate_pair.py:58``)."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.data.clustering import save_dedup_index

    data = synthetic.generate(num_targets=3, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    synthetic.export_partnet_tree(data, str(tmp_path), num_train=2)

    cfg = URedConfig(base_dir=str(tmp_path), category="chair", num_source=6,
                     mode="train", MAX_NUM_PARTS=8, num_target_points=64,
                     num_part_points=16)
    full = load_sources(cfg)
    assert len(full) == 6

    idx = np.array([4, 0, 2])
    save_dedup_index(str(tmp_path / "dedup_index.pickle"), idx)
    cfg.extras["dedup_index"] = True
    sub = load_sources(cfg)
    assert len(sub) == 3
    # sorted index order: rows 0, 2, 4 of the full DB
    np.testing.assert_allclose(sub.points, full.points[[0, 2, 4]])
    np.testing.assert_array_equal(sub.sem_ids, full.sem_ids[[0, 2, 4]])


def test_export_partnet_tree_roundtrip(tmp_path):
    """A synthetic corpus exported as a PartNet-layout tree must load back
    through the flagship real-data path (from_partnet) with identical
    geometry and consistent semantics — the seam the reference-scale
    end-to-end run rides."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data import corpus as corpus_mod
    from ured_tpu.data import synthetic

    data = synthetic.generate(num_targets=5, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    out = synthetic.export_partnet_tree(data, str(tmp_path), num_train=4)
    assert sorted(out) == ["datasplits", "sources_dir", "test", "train"]

    cfg = URedConfig(base_dir=str(tmp_path), category="chair", num_source=6,
                     mode="train", MAX_NUM_PARTS=8, num_target_points=64,
                     num_part_points=16)
    assert corpus_mod.real_data_available(cfg)
    c = corpus_mod.from_partnet(
        cfg, pair_cache=str(tmp_path / "pairs.npz"))
    assert len(c) == 4
    np.testing.assert_array_equal(c.points, data.points[:4])
    np.testing.assert_array_equal(c.labels, data.labels[:4])
    # source DB round-trips: points/A-matrices exact, semantic ids map back
    # through the vocabulary labels
    np.testing.assert_allclose(c.src_points, data.src_points, rtol=1e-6)
    np.testing.assert_allclose(c.src_mats, data.src_mats, rtol=1e-6)
    np.testing.assert_array_equal(c.src_sems, data.src_sems)
    # real on-device pair archive replaced the generator's proxy rows:
    # every valid part got a real distance row, padded slots the sentinel
    valid = c.label_table >= 0
    assert valid.any()
    assert np.isfinite(c.pair_dist[valid]).all()
    assert (c.pair_dist[~(c.num_parts[:, None] > np.arange(8))] >= 1e8).all()

    cfg_test = URedConfig(base_dir=str(tmp_path), category="chair",
                          num_source=6, mode="test", MAX_NUM_PARTS=8,
                          num_target_points=64, num_part_points=16)
    c_test = corpus_mod.from_partnet(
        cfg_test, pair_cache=str(tmp_path / "pairs_test.npz"))
    assert len(c_test) == 1
    np.testing.assert_array_equal(c_test.points, data.points[4:])
