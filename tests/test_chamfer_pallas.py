"""Pallas NN kernel parity vs the jnp oracle (interpret mode on CPU; the
same kernel compiles for real on TPU — exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.ops.chamfer import chamfer_reference
from ured_tpu.ops.chamfer_pallas import nn_distance_pallas


def _run(x, y, xm, ym, tile_n=128):
    return nn_distance_pallas(x, y, xm, ym, tile_n=tile_n, interpret=True)


def test_matches_oracle(rng):
    x = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    d1, i1, d2, i2 = _run(x, y, jnp.ones((2, 256)), jnp.ones((2, 128)))
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))


def test_masked_matches_sliced(rng):
    x = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 128, 3)), jnp.float32)
    xm = jnp.asarray(np.arange(256) < 200, jnp.float32)[None]
    ym = jnp.asarray(np.arange(128) < 100, jnp.float32)[None]
    d1, i1, d2, i2 = _run(x, y, xm, ym)
    rd1, ri1, rd2, ri2 = chamfer_reference(x[:, :200], y[:, :100])
    np.testing.assert_allclose(np.asarray(d1[:, :200]), np.asarray(rd1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2[:, :100]), np.asarray(rd2),
                               atol=1e-4)
    assert np.all(np.asarray(i1) < 100)   # only valid y selected
    assert np.all(np.asarray(i2) < 200)   # only valid x selected


def test_multi_tile(rng):
    x = jnp.asarray(rng.normal(size=(1, 512, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    d1, i1, d2, i2 = _run(x, y, jnp.ones((1, 512)), jnp.ones((1, 256)),
                          tile_n=128)
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))


def test_odd_n_single_full_tile(rng):
    # N=200 is not divisible by 128, but a full-array tile is always legal
    x = jnp.asarray(rng.normal(size=(1, 200, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 128, 3)), jnp.float32)
    d1, i1, d2, i2 = nn_distance_pallas(
        x, y, jnp.ones((1, 200)), jnp.ones((1, 128)), interpret=True)
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), atol=1e-4)


def test_prime_n_single_tile(rng):
    # prime N: only the full-array tile divides it, which is legal (block
    # dims equal to the full array dims bypass the (8, 128) tiling rule)
    from ured_tpu.ops.chamfer_pallas import pick_tile

    assert pick_tile(127, 127) == 127
    x = jnp.asarray(rng.normal(size=(1, 127, 3)), jnp.float32)
    d1, _, _, _ = _run(x, x, jnp.ones((1, 127)), jnp.ones((1, 127)))
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)


def test_tile_vmem_budget():
    from ured_tpu.ops.chamfer_pallas import pick_tile, _BLOCK_ELEMS

    # m=8192 fits with a 128-lane tile
    tn = pick_tile(2048, 8192)
    assert tn > 0 and tn * 8192 <= _BLOCK_ELEMS and 2048 % tn == 0
    # m=16384 cannot fit a >=128 tile -> caller swaps orientation or
    # falls back to the XLA path
    assert pick_tile(2048, 16384) == 0


def test_swapped_orientation_dispatch(rng):
    # nn_distance with a long second cloud swaps sides internally; results
    # must match the direct computation
    from ured_tpu.ops.chamfer import chamfer_raw

    x = jnp.asarray(rng.normal(size=(1, 128, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    d1, i1, d2, i2 = chamfer_raw(x, y)
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))


# ---------------------------------------------------------------------------
# packed min+index variant
# ---------------------------------------------------------------------------

def test_packed_indices_match_oracle(rng):
    from ured_tpu.ops.chamfer_pallas import nn_indices_pallas_packed

    # grid-separated points: no near-ties -> packed selection is exact
    x = jnp.asarray(rng.integers(0, 16, size=(2, 256, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 16, size=(2, 128, 3)), jnp.float32)
    i1, i2 = nn_indices_pallas_packed(
        x, y, jnp.ones((2, 256)), jnp.ones((2, 128)),
        tile_n=128, interpret=True)
    rd1, ri1, rd2, ri2 = chamfer_reference(x, y)
    # selected pairs must achieve the true minimum distance (indices may
    # differ between exact ties on the grid)
    d_sel = np.take_along_axis(
        np.asarray(((x[:, :, None] - y[:, None]) ** 2).sum(-1)),
        np.asarray(i1)[..., None], axis=2)[..., 0]
    np.testing.assert_allclose(d_sel, np.asarray(rd1), atol=1e-5)


def test_packed_selection_near_tie_contract(rng):
    from ured_tpu.ops.chamfer_pallas import nn_indices_pallas_packed

    x = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
    i1, i2 = nn_indices_pallas_packed(
        x, y, jnp.ones((2, 256)), jnp.ones((2, 128)),
        tile_n=128, interpret=True)
    rd1, _, rd2, _ = chamfer_reference(x, y)
    d_full = np.asarray(((x[:, :, None] - y[:, None]) ** 2).sum(-1))
    d1 = np.take_along_axis(d_full, np.asarray(i1)[..., None],
                            axis=2)[..., 0]
    d2 = np.take_along_axis(d_full.transpose(0, 2, 1),
                            np.asarray(i2)[..., None], axis=2)[..., 0]
    # 14 of 23 mantissa bits kept -> <= ~2^-9 relative near-tie window
    # (plus the packed-penalty offset on masked rows; none here)
    np.testing.assert_allclose(d1, np.asarray(rd1), rtol=3e-2)
    np.testing.assert_allclose(d2, np.asarray(rd2), rtol=3e-2)


def test_packed_masked_validity(rng):
    from ured_tpu.ops.chamfer_pallas import nn_indices_pallas_packed

    x = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 128, 3)), jnp.float32)
    xm = jnp.asarray(np.arange(256) < 200, jnp.float32)[None]
    ym = jnp.asarray(np.arange(128) < 100, jnp.float32)[None]
    i1, i2 = nn_indices_pallas_packed(x, y, xm, ym, tile_n=128,
                                      interpret=True)
    assert np.all(np.asarray(i1) < 100)
    assert np.all(np.asarray(i2) < 200)


def test_segment_rows_pallas_matches_scatter(rng):
    from ured_tpu.ops.chamfer import _scatter_add_batched
    from ured_tpu.ops.chamfer_pallas import segment_rows_pallas

    idx = jnp.asarray(rng.integers(0, 96, size=(4, 24)), jnp.int32)
    val = jnp.asarray(rng.normal(size=(4, 24, 3)), jnp.float32)
    got = segment_rows_pallas(idx, val, 96, tile_s=32, interpret=True)
    want = _scatter_add_batched(idx, val, 96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # duplicates-heavy case
    idx = jnp.zeros((2, 64), jnp.int32)
    val = jnp.ones((2, 64, 3), jnp.float32)
    got = segment_rows_pallas(idx, val, 64, tile_s=32, interpret=True)
    assert np.allclose(np.asarray(got)[:, 0], 64.0)
    assert np.allclose(np.asarray(got)[:, 1:], 0.0)
