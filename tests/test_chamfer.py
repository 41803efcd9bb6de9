"""Chamfer/NN kernel parity vs the pure-jnp oracle (reference test pattern:
``utils_v2/metrics/CD/unit_test.py:14-35`` compares CUDA vs python chamfer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.ops import (
    calc_cd,
    chamfer_distance,
    chamfer_raw,
    chamfer_reference,
    nn_distance,
)


def _clouds(rng, b=3, n=64, m=48, d=3):
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, m, d)), jnp.float32)
    return x, y


def test_forward_matches_oracle(rng):
    x, y = _clouds(rng)
    d1, i1, d2, i2 = chamfer_raw(x, y)
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    np.testing.assert_allclose(d1, rd1, atol=1e-5)
    np.testing.assert_allclose(d2, rd2, atol=1e-5)
    np.testing.assert_array_equal(i1, ri1)
    np.testing.assert_array_equal(i2, ri2)


@pytest.mark.parametrize("dim", [2, 3, 5])
def test_dims_2_3_5(rng, dim):
    # The CUDA tree templated the kernel to 2/3/5 dims; ours is dim-generic.
    x, y = _clouds(rng, d=dim)
    d1, _, d2, _ = chamfer_raw(x, y)
    rd1, _, rd2, _ = chamfer_reference(x, y)
    np.testing.assert_allclose(d1, rd1, atol=1e-5)
    np.testing.assert_allclose(d2, rd2, atol=1e-5)


def test_identical_clouds_zero(rng):
    x, _ = _clouds(rng)
    d = chamfer_distance(x, x)
    np.testing.assert_allclose(d, np.zeros(x.shape[0]), atol=1e-5)


def test_mask_equals_slicing(rng):
    # Masked fixed-shape chamfer == the reference's ragged slicing
    # (loss/chamfer_loss.py:13-27).
    x, y = _clouds(rng, b=2, n=64, m=64)
    nx, my = 40, 52
    xm = jnp.asarray(np.arange(64) < nx, jnp.float32)[None].repeat(2, 0)
    ym = jnp.asarray(np.arange(64) < my, jnp.float32)[None].repeat(2, 0)
    got = chamfer_distance(x, y, xm, ym)
    want = chamfer_distance(x[:, :nx], y[:, :my])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gradient_matches_autodiff_of_oracle(rng):
    x, y = _clouds(rng, b=2, n=32, m=24)

    def loss_fast(x, y):
        return jnp.sum(chamfer_distance(x, y))

    def loss_ref(x, y):
        d1, _, d2, _ = chamfer_reference(x, y)
        return jnp.sum(jnp.mean(d1, -1) + jnp.mean(d2, -1))

    gx, gy = jax.grad(loss_fast, argnums=(0, 1))(x, y)
    rgx, rgy = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(gx, rgx, atol=1e-4)
    np.testing.assert_allclose(gy, rgy, atol=1e-4)


def test_masked_gradient_matches_sliced(rng):
    x, y = _clouds(rng, b=1, n=32, m=32)
    nx, my = 20, 26
    xm = jnp.asarray(np.arange(32) < nx, jnp.float32)[None]
    ym = jnp.asarray(np.arange(32) < my, jnp.float32)[None]

    def loss_masked(x, y):
        return jnp.sum(chamfer_distance(x, y, xm, ym))

    def loss_sliced(x, y):
        return jnp.sum(chamfer_distance(x[:, :nx], y[:, :my]))

    gx, gy = jax.grad(loss_masked, argnums=(0, 1))(x, y)
    rgx, rgy = jax.grad(loss_sliced, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(gx[:, :nx], rgx[:, :nx], atol=1e-4)
    np.testing.assert_allclose(gy[:, :my], rgy[:, :my], atol=1e-4)
    np.testing.assert_allclose(gx[:, nx:], 0.0, atol=1e-6)
    np.testing.assert_allclose(gy[:, my:], 0.0, atol=1e-6)


def test_calc_cd_shapes(rng):
    x, y = _clouds(rng, b=4, n=32, m=32)
    cd_p, cd_t, f1 = calc_cd(x, y, calc_f1=True)
    assert cd_p.shape == (4,) and cd_t.shape == (4,) and f1.shape == (4,)
    assert np.all(np.asarray(cd_p) >= 0)


def test_jit_and_vmap_compose(rng):
    x, y = _clouds(rng, b=2, n=16, m=16)
    f = jax.jit(chamfer_distance)
    np.testing.assert_allclose(f(x, y), chamfer_distance(x, y), atol=1e-6)


# ---------------------------------------------------------------------------
# bf16 neighbor-selection variant (ops/chamfer.py::nn_distance_lowp)
# ---------------------------------------------------------------------------

def test_lowp_selection_contract_vs_oracle(rng):
    # The lowp contract: every selected neighbor is either the true nearest
    # (index matches the f32 oracle) or a near-tie — its exact distance is
    # within bf16 resolution (~0.4% rel) of the true minimum.
    x, y = _clouds(rng, b=4, n=96, m=80)
    d1, i1, d2, i2 = chamfer_raw(x, y, lowp=True)
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    for d, i, rd, ri in ((d1, i1, rd1, ri1), (d2, i2, rd2, ri2)):
        d, i, rd, ri = map(np.asarray, (d, i, rd, ri))
        mismatched = i != ri
        # mismatches happen only between near-ties: the exact distance of
        # the picked candidate is within the bf16 cancellation bound
        # (~eps * |x|^2+|y|^2 terms, here |coords|~N(0,1) -> slack ~0.1)
        assert mismatched.mean() < 0.35, mismatched.mean()
        assert np.all(rd <= d + 1e-6)                   # oracle is the min
        near_tie = d <= rd + 0.1
        assert np.all(near_tie | ~mismatched)
        # where selection agrees, distances are f32-exact
        np.testing.assert_allclose(d[~mismatched], rd[~mismatched],
                                   atol=1e-6)


def test_lowp_distances_exact_at_selected_pairs(rng):
    # Whatever neighbor bf16 picks, the returned distance must be the exact
    # f32 distance to THAT neighbor (this is the contract gradients rely on).
    x, y = _clouds(rng)
    d1, i1, d2, i2 = chamfer_raw(x, y, lowp=True)
    y_sel = jnp.take_along_axis(y, i1[..., None], axis=-2)
    x_sel = jnp.take_along_axis(x, i2[..., None], axis=-2)
    np.testing.assert_allclose(
        d1, jnp.sum((x - y_sel) ** 2, -1), atol=1e-6)
    np.testing.assert_allclose(
        d2, jnp.sum((y - x_sel) ** 2, -1), atol=1e-6)


def test_lowp_loss_close_to_exact(rng):
    # On generic random clouds the lowp chamfer LOSS stays within bf16
    # selection noise of the exact loss.
    x, y = _clouds(rng, b=4, n=128, m=96)
    exact = np.asarray(chamfer_distance(x, y))
    lowp = np.asarray(chamfer_distance(x, y, lowp=True))
    assert np.all(lowp >= exact - 1e-5)  # can only pick equal-or-worse pairs
    np.testing.assert_allclose(lowp, exact, rtol=1e-1)


def test_lowp_masked_empty_candidate_rows(rng):
    # Rows with zero valid candidates keep the +BIG penalty, like the exact
    # path, so callers' masked reductions behave identically.
    x, y = _clouds(rng, b=1, n=8, m=8)
    ym = jnp.zeros((1, 8), jnp.float32)
    d1, _, _, _ = chamfer_raw(x, y, None, ym, lowp=True)
    assert np.all(np.asarray(d1) >= 1e8)


def test_lowp_gradient_flows(rng):
    x, y = _clouds(rng, b=2, n=32, m=24)

    def loss(x, y):
        return jnp.sum(chamfer_distance(x, y, lowp=True))

    gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)
    assert np.all(np.isfinite(gx)) and np.all(np.isfinite(gy))
    # grid-separated points: selection == exact selection -> grads equal
    gxp = jnp.asarray(
        rng.integers(0, 8, size=(2, 32, 3)).astype(np.float32))
    gyp = jnp.asarray(
        rng.integers(0, 8, size=(2, 24, 3)).astype(np.float32))

    def loss_exact(x, y):
        return jnp.sum(chamfer_distance(x, y))

    g1 = jax.grad(loss, argnums=(0, 1))(gxp, gyp)
    g2 = jax.grad(loss_exact, argnums=(0, 1))(gxp, gyp)
    np.testing.assert_allclose(g1[0], g2[0], atol=1e-5)
    np.testing.assert_allclose(g1[1], g2[1], atol=1e-5)


def test_fused_segment_rows_matches_scatter(rng):
    # The TPU backward fast path (compare-and-reduce) must equal the
    # scatter-add formulation exactly, duplicates included.
    from ured_tpu.ops.chamfer import (
        _scatter_add_batched,
        _segment_rows_fused,
    )

    idx = jnp.asarray(rng.integers(0, 24, size=(4, 96)), jnp.int32)
    val = jnp.asarray(rng.normal(size=(4, 96, 3)), jnp.float32)
    want = _scatter_add_batched(idx, val, 24)
    for trailing in (False, True):
        got = _segment_rows_fused(idx, val, 24, reduce_trailing=trailing)
        np.testing.assert_allclose(got, want, atol=1e-5)
