"""Whole-shape connectivity-constrained deformation.

Reference: ``dataset_utils.py:get_shape:691-726`` (the [bs, 6K, 6K]
``connectivity_mat``), ``run_preprocessing.py:get_connectivity_matrix:572``
+ ``get_constraint_projection_matrix:599`` (C and its null-space
projector, persisted to h5 as ``constraint_mat``/``constraint_proj_mat``),
``load_sources.py:102-122`` (loaded under ``use_connectivity``).
"""

import json

import pytest

import jax.numpy as jnp
import numpy as np

from ured_tpu.data import io, preprocessing
from ured_tpu.data.parametric import compute_param_linear_equation
from ured_tpu.ops.deform import fit_params_icp, get_shape


def _box_mesh():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


def _jointed_shape(tmp_path, points_per_part=128):
    """Two touching unit boxes -> (parts, C, projector)."""
    v1, f1 = _box_mesh()
    v2 = v1 + np.array([1.0, 0, 0])
    hier = {"id": 0, "label": "chair",
            "children": [{"id": 1, "label": "chair_seat"},
                         {"id": 2, "label": "chair_back"}]}
    hp = str(tmp_path / "h.json")
    with open(hp, "w") as f:
        json.dump(hier, f)
    return preprocessing.process_shape(
        hp, None, None, points_per_part=points_per_part,
        meshes=[(v1, f1), (v2, f1)], adjacency_tol=0.1)


def _joint_point(parts, c):
    """Recover a joint point the constraints were built from: any point
    where both parts' B rows agree at rest."""
    # C rows are [B1 | -B2]; at rest B1 p1 = B2 p2 = joint
    b1 = c[:3, :6]
    return b1 @ parts[0].default_param


def test_get_shape_whole_shape_projector_welds_joint(tmp_path):
    parts, c, proj = _jointed_shape(tmp_path)
    assert c.shape == (3, 12)

    A = jnp.asarray(np.stack([p.points_mat for p in parts])[None],
                    jnp.float32)                       # [1, 2, 3n, 6]
    defaults = np.stack([p.default_param for p in parts])[None]
    rng = np.random.default_rng(0)
    deltas = rng.normal(scale=0.3, size=(1, 2, 6))

    out = get_shape(A, jnp.asarray(deltas, jnp.float32),
                    jnp.asarray(defaults, jnp.float32), alpha=0.5,
                    connectivity=jnp.asarray(proj[None], jnp.float32))
    assert out.shape[:2] == (1, 2)

    # the projected absolute params satisfy C @ p == 0 ...
    p_abs = (0.5 * deltas + defaults).reshape(12)
    p_proj = proj @ p_abs
    np.testing.assert_allclose(c @ p_proj, 0.0, atol=1e-8)
    # ... and the op's output is exactly A applied to them
    want = np.einsum("pkd,pd->pk", np.stack([p.points_mat for p in parts]),
                     p_proj.reshape(2, 6)).reshape(2, -1, 3)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-4,
                               atol=1e-5)

    # the joint point expressed through either part's box agrees (welded)
    joint = _joint_point(parts, c)
    b1 = compute_param_linear_equation(joint[None], parts[0].box)
    b2 = compute_param_linear_equation(joint[None], parts[1].box)
    j1 = b1 @ p_proj[:6]
    j2 = b2 @ p_proj[6:]
    np.testing.assert_allclose(j1, j2, atol=1e-8)
    # without the projector the joint tears
    j1_raw = b1 @ p_abs[:6]
    j2_raw = b2 @ p_abs[6:]
    assert np.abs(j1_raw - j2_raw).max() > 1e-3


def test_per_part_block_connectivity_still_supported():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(2, 3, 12, 6)), jnp.float32)
    params = jnp.asarray(rng.normal(size=(2, 3, 6)), jnp.float32)
    blocks = jnp.asarray(np.tile(np.eye(6) * 0.5, (2, 3, 1, 1)),
                         jnp.float32)
    out = get_shape(A, params, connectivity=blocks)
    want = get_shape(A, 0.5 * params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_h5_persists_constraints_and_load_sources_reads_them(tmp_path):
    parts, c, proj = _jointed_shape(tmp_path)
    h5_dir = str(tmp_path / "h5")
    paths = preprocessing.save_parts(h5_dir, "42", parts,
                                     constraint_mat=c, constraint_proj=proj)

    # reference key names in the file
    import h5py

    with h5py.File(paths[0], "r") as f:
        assert "constraint_mat" in f and "constraint_proj_mat" in f

    p0 = io.load_part_h5(paths[0], constraint=True)
    np.testing.assert_allclose(p0.constraint_mat, c)
    np.testing.assert_allclose(p0.constraint_proj, proj)
    assert p0.part_index == 0
    # default (constraint=False) load skips them
    assert io.load_part_h5(paths[0]).constraint_mat is None

    from ured_tpu.config import URedConfig
    from ured_tpu.data.partnet import load_sources

    cfg = URedConfig(use_connectivity=True)
    db = load_sources(cfg, h5_dir=h5_dir,
                      source_names=["42_0", "42_1"])
    assert db.constraint_projs is not None
    np.testing.assert_allclose(db.constraint_projs[1], proj)
    assert list(db.part_indices) == [0, 1]

    cfg_off = URedConfig(use_connectivity=False)
    db_off = load_sources(cfg_off, h5_dir=h5_dir,
                          source_names=["42_0", "42_1"])
    assert db_off.constraint_projs is None


def test_subset_projection(tmp_path):
    parts, c, proj = _jointed_shape(tmp_path)
    from ured_tpu.engine.export import subset_projection

    # both parts selected -> the full projector
    np.testing.assert_allclose(subset_projection(c, [0, 1]), proj,
                               atol=1e-8)
    # one part alone: the joint constraint touches the absent part and is
    # dropped -> identity (unconstrained)
    np.testing.assert_allclose(subset_projection(c, [0]), np.eye(6),
                               atol=1e-8)


def test_fit_params_icp_with_connectivity(tmp_path):
    parts, c, proj = _jointed_shape(tmp_path, points_per_part=64)
    A = jnp.asarray(np.stack([p.points_mat for p in parts])[None],
                    jnp.float32)
    defaults = np.stack([p.default_param for p in parts])[None]
    target = jnp.asarray(
        np.concatenate([p.points for p in parts])[None] * 1.2, jnp.float32)

    out = fit_params_icp(A, jnp.asarray(defaults, jnp.float32), target,
                         iters=3,
                         connectivity=jnp.asarray(proj[None], jnp.float32))
    flat = np.asarray(out).reshape(12)
    np.testing.assert_allclose(c @ flat, 0.0, atol=1e-4)
    # and it actually moved toward the scaled target
    assert np.abs(flat - defaults.reshape(12)).max() > 1e-3


def test_export_assembly_welds_coretrieved_parts(tmp_path):
    parts, c, proj = _jointed_shape(tmp_path)
    from ured_tpu.engine.export import export_deformed_assembly

    rng = np.random.default_rng(2)
    deltas = rng.normal(scale=0.3, size=(2, 6))
    defaults = np.stack([p.default_param for p in parts])
    alpha = 0.5

    paths = export_deformed_assembly(
        str(tmp_path / "out"), "t0",
        [p.vertices_mat for p in parts], [p.faces for p in parts],
        deltas, defaults, alpha=alpha,
        shape_keys=["42", "42"], constraint_mats=[c, c],
        part_indices=[0, 1])
    assert any(p.endswith("combined.obj") for p in paths)

    # the written parts correspond to the projected absolute params
    p_proj = (proj @ (alpha * deltas + defaults).reshape(12)).reshape(2, 6)
    v0, _ = io.read_obj(paths[0])
    want0 = (parts[0].vertices_mat @ p_proj[0]).reshape(-1, 3)
    np.testing.assert_allclose(v0, want0, atol=1e-5)

    # joint welded: closest distance between the two written parts is ~0
    v1, _ = io.read_obj(paths[1])
    joint = _joint_point(parts, c)
    b1 = compute_param_linear_equation(joint[None], parts[0].box)
    b2 = compute_param_linear_equation(joint[None], parts[1].box)
    np.testing.assert_allclose(b1 @ p_proj[0], b2 @ p_proj[1], atol=1e-8)


def test_export_welding_duplicate_retrieved_part(tmp_path):
    """Two target slots retrieving the SAME source part must be treated as
    separate shape instances: duplicated 6-dof blocks inside one projector
    would relax each joint constraint C_i.p = 0 into C_i.(p1+p2) = 0.  The
    mixed case [part0, part1, part0-again] welds the first pair and leaves
    the extra copy alone."""
    parts, c, proj = _jointed_shape(tmp_path)
    from ured_tpu.engine.export import export_deformed_assembly

    rng = np.random.default_rng(5)
    deltas = rng.normal(scale=0.3, size=(3, 6))
    defaults = np.stack([p.default_param for p in parts]
                        + [parts[0].default_param])
    alpha = 0.5
    mats = [parts[0].vertices_mat, parts[1].vertices_mat,
            parts[0].vertices_mat]
    faces = [parts[0].faces, parts[1].faces, parts[0].faces]

    paths = export_deformed_assembly(
        str(tmp_path / "out_dup"), "t0", mats, faces,
        deltas, defaults, alpha=alpha,
        shape_keys=["42", "42", "42"], constraint_mats=[c, c, c],
        part_indices=[0, 1, 0])

    p_abs = alpha * deltas + defaults
    # instance 0 = slots (0, 1): welded through the whole-shape projector
    p_weld = (proj @ p_abs[:2].reshape(12)).reshape(2, 6)
    v0, _ = io.read_obj(paths[0])
    np.testing.assert_allclose(
        v0, (parts[0].vertices_mat @ p_weld[0]).reshape(-1, 3), atol=1e-5)
    # instance 1 = slot 2 alone: its single-block subset has no applicable
    # constraints, so its params pass through unprojected
    v2, _ = io.read_obj(paths[2])
    np.testing.assert_allclose(
        v2, (parts[0].vertices_mat @ p_abs[2]).reshape(-1, 3), atol=1e-5)


@pytest.mark.slow
def test_run_vis_with_use_connectivity(tmp_path):
    """cfg.use_connectivity drives the vis export path end-to-end: a
    constraint-bearing SourceDB (meshes + per-row C/projector/part index)
    exports OBJ assemblies with co-retrieved same-shape parts welded.

    slow: second full vis-pipeline compile in the suite (~35 s on the
    1-core CI box); the projector math itself is covered by the fast
    tests above, and the default vis path by test_aux.py."""
    import jax

    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.data.partnet import SourceDB
    from ured_tpu.data.vocab import label_id
    from ured_tpu.engine.vis import run_vis
    from ured_tpu.models.ured import URED

    parts, c, proj = _jointed_shape(tmp_path, points_per_part=32)
    rows = []
    for shape_id in ("42", "43"):
        for i, p in enumerate(parts):
            rows.append((f"{shape_id}_{i}", p, i))
    source_db = SourceDB(
        points=np.stack([p.points.astype(np.float32) for _, p, _ in rows]),
        mats=np.stack([p.points_mat.astype(np.float32) for _, p, _ in rows]),
        default_params=np.stack([p.default_param.astype(np.float32)
                                 for _, p, _ in rows]),
        sem_ids=np.asarray([label_id(p.label) for _, p, _ in rows],
                           np.int32),
        sem_labels=[p.label for _, p, _ in rows],
        model_ids=[mid for mid, _, _ in rows],
        vertices=[p.vertices for _, p, _ in rows],
        vertices_mats=[p.vertices_mat for _, p, _ in rows],
        faces=[p.faces for _, p, _ in rows],
        constraint_mats=[c] * len(rows),
        constraint_projs=[proj] * len(rows),
        part_indices=np.asarray([i for _, _, i in rows]))

    cfg = URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=128,
                     num_part_points=32, sem_latent_dim=8,
                     source_latent_dim=16, target_latent_dim=16,
                     part_latent_dim=16, use_connectivity=True)
    data = synthetic.generate(num_targets=2, num_sources=4, n_points=128,
                              points_per_part=32, max_parts=8, seed=0)
    model = URED(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    import os

    metrics = run_vis(cfg, model, variables, data, source_db,
                      str(tmp_path / "vis"), max_targets=2)
    assert np.isfinite(metrics["best_full_cd_loss"])
    files = os.listdir(str(tmp_path / "vis"))
    assert any(f.endswith("combined.obj") for f in files)
