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
    cfg = URedConfig(base_dir=str(tmp_path), category="table", num_source=2,
                     MAX_NUM_PARTS=4, complementme=True)
    os.makedirs(str(tmp_path / "generated_datasplits"))
    pts = rng.normal(size=(2, 16, 3)).astype(np.float32)
    io.save_targets_h5(
        str(tmp_path / "generated_datasplits" / "table_2_train.h5"),
        pts, rng.integers(0, 2, size=(2, 16)),
        rng.integers(0, 42, size=(2, 16)), np.arange(2))
    ds = ShapeNetDataset.from_h5(cfg)
    # ComplementMe z-mirroring applied (reference train.py:192-194)
    np.testing.assert_allclose(ds.points[:, :, 2], -pts[:, :, 2], atol=1e-6)
    np.testing.assert_allclose(ds.points[:, :, 0], pts[:, :, 0], atol=1e-6)
