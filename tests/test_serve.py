"""Serving surface: InferenceSession, request padding, AOT artifact.

The reference has no serving path (closest: the ``vis.py`` batch loop);
this is the deployment capability the rebuilt framework adds on top.
"""

import json

import numpy as np
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.engine.serve import InferenceSession, load_artifact


def _tiny_cfg(**kw):
    base = dict(batch_size=4, MAX_NUM_PARTS=8, num_target_points=64,
                num_part_points=16, sem_latent_dim=8, source_latent_dim=16,
                target_latent_dim=16, part_latent_dim=16, epochs=1)
    base.update(kw)
    cfg = URedConfig(**base)
    cfg.extras.update(synthetic_targets=8, synthetic_sources=6)
    return cfg


@pytest.fixture(scope="module")
def session():
    return InferenceSession.from_config(_tiny_cfg())


@pytest.fixture(scope="module")
def requests_batch():
    from ured_tpu.engine.train import resolve_corpus

    data = resolve_corpus(_tiny_cfg())
    b = data.make_batch(np.arange(6))
    return b["x"], b["labels"], b["tgt_sem"]


def test_predict_shapes_and_padding(session, requests_batch):
    pts, labels, sems = requests_batch
    # 6 requests over batch_size=4 -> two padded program invocations
    out = session.predict(pts, labels, sems)
    assert out["cd_full"].shape == (6,)
    assert out["top1"].shape == (6, 8)
    assert out["deformed"].shape[0] == 6
    assert np.all(np.isfinite(out["cd_full"]))

    # padding must not perturb results: a 3-request call equals the first
    # three rows of the 6-request call (eval mode is per-sample independent)
    out3 = session.predict(pts[:3], labels[:3], sems[:3])
    np.testing.assert_allclose(out3["cd_full"], out["cd_full"][:3],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out3["top1"], out["top1"][:3])


def test_predict_single_request(session, requests_batch):
    pts, labels, sems = requests_batch
    one = session.predict(pts[0], labels[0], sems[0])
    assert one["cd_full"].shape == ()
    batch = session.predict(pts[:1], labels[:1], sems[:1])
    np.testing.assert_allclose(one["cd_full"], batch["cd_full"][0],
                               rtol=1e-6)


@pytest.mark.slow  # 1-core lane budget: second session compile for the save/load path; covered by the fast session contract + IO units
def test_artifact_roundtrip(session, requests_batch):
    """The serialized StableHLO artifact reproduces the live session."""
    import jax.numpy as jnp

    pts, labels, sems = requests_batch
    blob = session.export_artifact()
    assert isinstance(blob, bytes) and len(blob) > 0
    served = load_artifact(blob)

    batch = {"x": jnp.asarray(pts[:4], jnp.float32),
             "labels": jnp.asarray(labels[:4], jnp.int32),
             "tgt_sem": jnp.asarray(sems[:4], jnp.int32)}
    live = session._step(session.variables, batch, session.src_db)
    art = served(batch)
    np.testing.assert_allclose(np.asarray(art["cd_full"]),
                               np.asarray(live["cd_full"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(art["top1"]),
                                  np.asarray(live["top1"]))


def test_predict_unlabeled_roca_bridge(session):
    """Label-free serving (the ROCA scan mode): a synthetic depth
    detection back-projects to an object-frame cloud and serves as one
    whole-object part."""
    from ured_tpu.data.roca import ROCADataset, ROCADetection

    h = w = 24
    depth = np.full((h, w), 2.0, np.float32)
    mask = np.zeros((h, w), bool)
    mask[6:18, 6:18] = True
    intr = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1.0]])
    det = ROCADetection(depth=depth, mask=mask, intrinsics=intr,
                        q=np.array([1.0, 0, 0, 0]), t=np.zeros(3))
    ds = ROCADataset([det], num_points=session.num_points)
    out = session.predict_unlabeled(ds.get_target_points(0))
    assert np.isfinite(out["cd_full"])
    assert out["deformed"].ndim == 3  # [P, n, 3] single request


@pytest.mark.slow  # 1-core lane budget: mesh duplicate of the single-device session contract (test_predict_shapes_and_padding stays fast)
def test_session_on_mesh_matches_single_device(session, requests_batch):
    """A (dp, db)-mesh session returns the single-device results exactly
    (db-sharded retrieval + dp-sharded batch, the evaluate() placement)."""
    from ured_tpu.parallel.mesh import make_mesh

    pts, labels, sems = requests_batch
    mesh_sess = InferenceSession(
        session.cfg, session.model, session.variables,
        {k: v for k, v in session.src_db.items()},
        batch_size=session.batch_size, mesh=make_mesh(dp=2, db=4))
    want = session.predict(pts, labels, sems)
    got = mesh_sess.predict(pts, labels, sems)
    np.testing.assert_array_equal(got["top1"], want["top1"])
    np.testing.assert_allclose(got["cd_full"], want["cd_full"],
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="single-device"):
        mesh_sess.export_artifact()


def test_response_projection(session, requests_batch):
    """serve_response_keys/serve_response_dtype project and downcast the
    payload ON DEVICE: only the requested keys cross the wire, floats in
    the requested dtype, ids untouched, values matching the full session."""
    import ml_dtypes

    pts, labels, sems = requests_batch
    lean = InferenceSession(
        session.cfg, session.model, session.variables,
        {k: v for k, v in session.src_db.items()},
        batch_size=session.batch_size,
        response_keys=("top1", "params", "cd_full"),
        response_dtype="bfloat16")
    out = lean.predict(pts, labels, sems)
    assert set(out) == {"top1", "params", "cd_full"}
    assert out["cd_full"].dtype == ml_dtypes.bfloat16
    assert out["top1"].dtype == np.int32 or np.issubdtype(
        out["top1"].dtype, np.integer)
    full = session.predict(pts, labels, sems)
    np.testing.assert_array_equal(out["top1"], full["top1"])
    np.testing.assert_allclose(np.asarray(out["cd_full"], np.float32),
                               full["cd_full"], rtol=2e-2, atol=1e-4)
    with pytest.raises(ValueError, match="unknown response keys"):
        InferenceSession(
            session.cfg, session.model, session.variables,
            {k: v for k, v in session.src_db.items()},
            batch_size=session.batch_size, response_keys=("nope",))


def test_response_projection_from_config(tmp_path):
    """The cfg extras route (the serve CLI's path) builds a projected
    session."""
    cfg = _tiny_cfg()
    cfg.extras.update(serve_response_keys=["top1", "cd_full"],
                      serve_response_dtype="float16")
    sess = InferenceSession.from_config(cfg)
    assert sess.response_keys == ("top1", "cd_full")
    assert sess.response_dtype == np.float16


def test_serve_cli(tmp_path):
    from ured_tpu.engine import serve

    from ured_tpu.engine.train import resolve_corpus

    cfg = _tiny_cfg()
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(str(cfg_path))

    data = resolve_corpus(_tiny_cfg())
    b = data.make_batch(np.arange(5))
    req_path = str(tmp_path / "req.npz")
    np.savez(req_path, points=b["x"], labels=b["labels"],
             tgt_sem=b["tgt_sem"])

    out_path = str(tmp_path / "resp.npz")
    art_path = str(tmp_path / "art.bin")
    out = serve.main(["serve", str(cfg_path), req_path, out_path,
                      "--artifact", art_path])
    assert np.all(np.isfinite(out["cd_full"]))
    resp = np.load(out_path)
    assert resp["cd_full"].shape[0] == 5
    assert len(open(art_path, "rb").read()) > 0
