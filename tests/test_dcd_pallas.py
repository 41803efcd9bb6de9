"""Fused pair-DCD Pallas kernel parity vs the composable calc_dcd path
(interpret mode on CPU; real-kernel timing happens in the TPU drives)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.ops.dcd import calc_dcd
from ured_tpu.ops.dcd_pallas import pair_dcd_eligible, pair_dcd_pallas


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(4, 96, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(4, 128, 3)), jnp.float32)
    return x, y


def test_matches_calc_dcd(clouds):
    x, y = clouds
    dcd, cd_p, cd_t = pair_dcd_pallas(x, y, alpha=1000.0, interpret=True)
    ref = calc_dcd(x, y, alpha=1000.0)
    np.testing.assert_allclose(np.asarray(dcd), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cd_p), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cd_t), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-6)


def test_alpha_plumbs_through(clouds):
    x, y = clouds
    a1 = pair_dcd_pallas(x, y, alpha=50.0, interpret=True)[0]
    a2 = pair_dcd_pallas(x, y, alpha=1000.0, interpret=True)[0]
    ref = calc_dcd(x, y, alpha=50.0)[0]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(ref), rtol=1e-5)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_identical_clouds_zero_distance():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 64, 3)), jnp.float32)
    dcd, cd_p, cd_t = pair_dcd_pallas(x, x, interpret=True)
    np.testing.assert_allclose(np.asarray(cd_t), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cd_p), 0.0, atol=1e-4)


def test_asymmetric_sizes(clouds):
    """n != m exercises the frac_12/frac_21 density normalizers."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(2, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(2, 160, 3)), jnp.float32)
    out = pair_dcd_pallas(x, y, interpret=True)
    ref = calc_dcd(x, y)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eligibility_budget():
    assert not pair_dcd_eligible(4096, 4096)   # 16M elems > VMEM budget
    with pytest.raises(ValueError):
        pair_dcd_pallas(jnp.zeros((1, 4096, 3)), jnp.zeros((1, 4096, 3)),
                        interpret=True)


@pytest.mark.parametrize("pp", [2, 3, 4])
def test_pairs_per_step_parity(clouds, pp):
    """The multi-pair grid step (URED_DCD_PPS) is bit-identical to the
    one-pair form, including when pp does not divide B (padding rows are
    computed then discarded)."""
    x, y = clouds                                       # B=4: pp=3 pads
    base = pair_dcd_pallas(x, y, alpha=1000.0, interpret=True)
    multi = pair_dcd_pallas(x, y, alpha=1000.0, interpret=True,
                            pairs_per_step=pp)
    for a, b in zip(base, multi):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pair_chunk_fused_matches_unfused():
    """The dispatch seam in data.pairs._pair_chunk: both paths must agree."""
    from ured_tpu.data.pairs import _pair_chunk

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(size=(3, 80, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(5, 96, 3)), jnp.float32)
    ref = _pair_chunk(q, s, alpha=1000.0, fused=False)
    # interpret-mode kernel via monkeypatched call is overkill; on CPU the
    # fused flag stays off (pair_dcd_eligible is platform-gated), so check
    # the oracle math directly against the kernel at the same flattening
    qq = jnp.repeat(q, 5, axis=0)
    ss = jnp.tile(s, (3, 1, 1))
    fused = pair_dcd_pallas(qq, ss, alpha=1000.0, interpret=True)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a).ravel(), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
