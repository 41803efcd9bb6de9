"""Loss-layer tests: masked batched losses vs direct per-sample math."""

import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.losses import (
    assembly_chamfer_loss,
    contrastive_loss,
    pc_consistency,
    pc_consistency_weighted,
    regularization_param,
    residual_retrieval_loss,
    symmetry_loss,
)
from ured_tpu.ops import chamfer_distance
from ured_tpu.ops.deform import group_points_by_part


def test_pc_consistency(rng):
    a = jnp.asarray(rng.normal(size=(2, 10, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 10, 3)), jnp.float32)
    want = np.mean(np.sum((np.asarray(a) - np.asarray(b)) ** 2, -1))
    np.testing.assert_allclose(pc_consistency(a, b), want, rtol=1e-5)


def test_pc_consistency_weighted_masks_parts(rng):
    pc1 = jnp.asarray(rng.normal(size=(2, 3, 8, 3)), jnp.float32)
    pc2 = jnp.asarray(rng.normal(size=(2, 3, 8, 3)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)
    got = pc_consistency_weighted(pc1, pc2, mask)
    vals = np.mean(np.sum((np.asarray(pc1) - np.asarray(pc2)) ** 2, -1), -1)
    want = (vals[0, 0] + vals[0, 1] + vals[1, 0]) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_regularization_param(rng):
    params = jnp.asarray(rng.normal(size=(2, 3, 6)), jnp.float32)
    mask = jnp.asarray([[1, 0, 0], [1, 1, 0]], jnp.float32)
    got = regularization_param(params, mask)
    norms = np.linalg.norm(np.asarray(params), axis=-1)
    want = (norms[0, 0] + norms[1, 0] + norms[1, 1]) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_contrastive_loss_prefers_matching(rng):
    # aligned features -> low loss; shuffled -> higher loss
    f = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    valid = jnp.ones((2, 4), jnp.float32)
    aligned = contrastive_loss(f, f, valid)
    shuffled = contrastive_loss(f, f[::-1], valid)
    assert float(aligned) < float(shuffled)


def test_contrastive_loss_ignores_invalid(rng):
    f = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    valid = jnp.asarray([[1, 1, 0, 0]], jnp.float32)
    # changing an invalid row's target feature must not change the loss
    f2 = f.at[0, 3].set(100.0)
    l1 = contrastive_loss(f, g, valid)
    l2 = contrastive_loss(f2, g, valid)
    np.testing.assert_allclose(l1, l2, rtol=1e-4)


def test_assembly_chamfer_matches_manual(rng):
    b, p, n, npoints = 1, 2, 16, 32
    deformed = jnp.asarray(rng.normal(size=(b, p, n, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, npoints, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=(b, npoints)))
    # slot size >= worst-case part size so no overflow skews the comparison
    tgt_parts, tgt_valid = group_points_by_part(x, labels, p, npoints)
    part_mask = jnp.ones((b, p), jnp.float32)

    full, part = assembly_chamfer_loss(deformed, x, tgt_parts, tgt_valid,
                                       part_mask)
    want_full = chamfer_distance(deformed.reshape(b, p * n, 3), x)
    np.testing.assert_allclose(full, want_full.mean(), rtol=1e-5)

    manual_parts = []
    for pi in range(p):
        sel = np.asarray(labels[0]) == pi
        tp = jnp.asarray(np.asarray(x[0])[sel])[None]
        manual_parts.append(float(chamfer_distance(deformed[:, pi], tp)[0]))
    np.testing.assert_allclose(part, np.mean(manual_parts), rtol=1e-4)


def test_symmetry_loss_zero_for_symmetric_cloud(rng):
    # target symmetric about x=0 and deformed == target -> reflection loss
    # equals plain chamfer of the reflected (tiny here)
    half = rng.normal(size=(1, 1, 8, 3)).astype(np.float32)
    sym = np.concatenate([half, half * [-1, 1, 1]], axis=2)
    deformed = jnp.asarray(sym)
    x = jnp.asarray(sym.reshape(1, 16, 3))
    labels = jnp.zeros((1, 16), jnp.int32)
    tgt_parts, tgt_valid = group_points_by_part(x, labels, 1, 16)
    mask = jnp.ones((1, 1), jnp.float32)
    full, _ = symmetry_loss(deformed, x, tgt_parts, tgt_valid, mask)
    assert float(full) < 1e-6


def test_residual_retrieval_loss_zero_when_residual_closes_gap(rng):
    # well-separated points so each x's nearest deformed point is its own
    # offset copy (offset << inter-point spacing)
    x = jnp.asarray(np.arange(8)[:, None] * np.array([10.0, 0, 0]),
                    jnp.float32)[None]
    offset = jnp.asarray([0.5, 0.0, 0.0])
    deformed = x + offset  # each x's nn is x+offset
    residuals = jnp.broadcast_to(offset, x.shape)
    mask = jnp.ones((1, 8), jnp.float32)
    loss, reg = residual_retrieval_loss(x, deformed, mask, residuals)
    assert float(loss) < 1e-5
    np.testing.assert_allclose(reg, 0.5, rtol=1e-5)


def test_residual_retrieval_respects_mask(rng):
    x = jnp.zeros((1, 4, 3), jnp.float32)
    # two assembly points: a masked one at origin, a valid one at (1,0,0)
    deformed = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0]]], jnp.float32)
    mask = jnp.asarray([[0.0, 1.0]])
    residuals = jnp.zeros((1, 4, 3), jnp.float32)
    loss, _ = residual_retrieval_loss(x, deformed, mask, residuals)
    np.testing.assert_allclose(loss, 1.0, rtol=1e-5)  # nn is the valid point

