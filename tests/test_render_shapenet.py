"""Snapshot rendering, meters, ShapeNet dataset variant."""

import os

import numpy as np

from ured_tpu.config import URedConfig
from ured_tpu.data import io
from ured_tpu.data.partnet import ShapeNetDataset
from ured_tpu.utils.render import (
    AverageValueMeter,
    render_comparison,
    render_point_cloud,
)


def test_render_point_cloud(tmp_path, rng):
    pts = rng.normal(size=(128, 3))
    p = render_point_cloud(pts, str(tmp_path / "snap.png"),
                           labels=rng.integers(0, 4, 128))
    assert os.path.getsize(p) > 1000


def test_render_comparison(tmp_path, rng):
    a, b = rng.normal(size=(64, 3)), rng.normal(size=(64, 3))
    p = render_comparison([a, b], str(tmp_path / "cmp.png"),
                          titles=["source", "deformed"])
    assert os.path.getsize(p) > 1000


def test_average_meter():
    m = AverageValueMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0
    assert abs(m.std - np.std([1, 2, 3])) < 1e-6
    m.reset()
    assert m.n == 0 and m.avg == 0.0


def test_shapenet_dataset_complementme_flip(tmp_path, rng):
    from ured_tpu.data.partnet import shapenet_targets_h5_path

    cfg = URedConfig(base_dir=str(tmp_path), category="table", num_source=2,
                     MAX_NUM_PARTS=4, complementme=True, middle_name="orion")
    # ComplementMe nested layout (reference shapenet_dataset.py:16-21):
    # <base>/generated_datasplits_complementme/<middle_name>/
    #   generated_datasplits_complementme/<category>_<num>_<mode>.h5
    path = shapenet_targets_h5_path(cfg)
    assert "generated_datasplits_complementme/orion/" \
        "generated_datasplits_complementme" in path
    os.makedirs(os.path.dirname(path))
    pts = rng.normal(size=(2, 16, 3)).astype(np.float32)
    io.save_targets_h5(path, pts, rng.integers(0, 2, size=(2, 16)),
                       rng.integers(0, 42, size=(2, 16)), np.arange(2))
    ds = ShapeNetDataset.from_h5(cfg)
    # ComplementMe z-mirroring applied (reference train.py:192-194)
    np.testing.assert_allclose(ds.points[:, :, 2], -pts[:, :, 2], atol=1e-6)
    np.testing.assert_allclose(ds.points[:, :, 0], pts[:, :, 0], atol=1e-6)


def test_shapenet_occlusion_default_and_corpus_selection():
    """ShapeNet uses the live 30/30/30/10 occlusion mixture; PartNet pins
    the ball generator (reference shapenet_dataset.py:50-58 vs
    partnet_dataset.py:50)."""
    from ured_tpu.data import corpus
    from ured_tpu.data.partnet import PartNetDataset

    assert PartNetDataset.default_occlusion == "ball"
    assert ShapeNetDataset.default_occlusion == "mixed"

    cfg = URedConfig()
    assert corpus.dataset_class(cfg) is PartNetDataset
    cfg.extras["dataset"] = "shapenet"
    assert corpus.dataset_class(cfg) is ShapeNetDataset
