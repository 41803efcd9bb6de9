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


def test_bad_tile_raises(rng):
    x = jnp.asarray(rng.normal(size=(1, 200, 3)), jnp.float32)
    with pytest.raises(ValueError):
        nn_distance_pallas(x, x, jnp.ones((1, 200)), jnp.ones((1, 200)),
                           tile_n=128, interpret=True)
