"""Completion trainer + mesh export tests."""

import os

import numpy as np
import pytest

from ured_tpu.engine.completion import (
    alpha_schedule,
    make_lr_schedule,
    train_completion,
)
from ured_tpu.engine.export import (
    deform_vertices,
    export_deformed_assembly,
    export_point_cloud,
)
from ured_tpu.data import io
from ured_tpu.data.parametric import (
    aabbox_of_points,
    compute_param_linear_equation,
    get_default_param,
)

pytestmark = pytest.mark.slow  # end-to-end tier: run the core loop with -m 'not slow'


def test_alpha_schedule_monotone():
    # the varying loss constant ramps 0.01 -> 1.0 (ref train.py:86-115)
    vals = [alpha_schedule(e, 100) for e in (0, 15, 40, 90)]
    assert vals == [0.01, 0.1, 0.5, 1.0]


def test_lr_schedule_warmup_then_decay():
    s = make_lr_schedule(1e-3, steps_per_epoch=10, warmup_epochs=2,
                         decay_epochs=4, decay_rate=0.5)
    assert float(s(0)) == 0.0
    assert float(s(20)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(20 + 40)) == pytest.approx(5e-4, rel=1e-6)


@pytest.mark.parametrize("model_name", ["pcn", "vrcnet"])
def test_completion_trains(model_name):
    state, best = train_completion(
        model_name=model_name, epochs=1, batch_size=4, num_train=4,
        n_points=64, seed=0)
    assert np.isfinite(best["dcd"])
    assert 0.0 <= best["f1"] <= 1.0


def test_deform_vertices_matches_parametric(rng):
    v = rng.uniform(-1, 1, size=(20, 3))
    box = aabbox_of_points(v)
    vmat = compute_param_linear_equation(v, box)
    x0 = get_default_param(box)
    # zero delta reproduces the mesh
    out = deform_vertices(vmat, np.zeros(6), x0, alpha=0.1)
    np.testing.assert_allclose(out, v, atol=1e-10)
    # pure translation delta shifts it
    out = deform_vertices(vmat, np.array([1.0, 0, 0, 0, 0, 0]), x0,
                          alpha=1.0)
    np.testing.assert_allclose(out, v + [1, 0, 0], atol=1e-10)


def test_export_assembly(tmp_path, rng):
    v = rng.uniform(-1, 1, size=(8, 3))
    f = np.array([[0, 1, 2], [3, 4, 5]])
    box = aabbox_of_points(v)
    vmat = compute_param_linear_equation(v, box)
    x0 = get_default_param(box)
    paths = export_deformed_assembly(
        str(tmp_path), "test",
        vertices_mats=[vmat, vmat], faces=[f, f],
        params=np.zeros((2, 6)),
        default_params=np.stack([x0, x0]),
        part_mask=np.array([1.0, 0.0]))
    # one live part + combined
    assert len(paths) == 2
    assert paths[-1].endswith("combined.obj")
    v2, f2 = io.read_obj(paths[0])
    np.testing.assert_allclose(v2, v, atol=1e-5)

    ply = export_point_cloud(str(tmp_path), "cloud",
                             rng.normal(size=(16, 3)),
                             labels=np.arange(16) % 4)
    back = io.read_ply_points(ply)
    assert back.shape == (16, 3)


def test_completion_trains_adversarial():
    """GAN path integrated into the trainer (vrcnet_plus discriminator,
    reference utils/train_utils.py:40-58)."""
    state, best = train_completion(
        model_name="pcn", epochs=1, batch_size=4, num_train=4,
        n_points=64, seed=0, adversarial=True)
    assert np.isfinite(best["dcd"])


def test_completion_cli(tmp_path, monkeypatch, capsys):
    from ured_tpu.engine import completion as comp_mod

    monkeypatch.chdir(tmp_path)
    comp_mod.main(["completion", "pcn", "1"])
    out = capsys.readouterr().out
    assert "best:" in out and "dcd" in out
