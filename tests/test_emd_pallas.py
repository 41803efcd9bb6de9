"""VMEM-resident Pallas auction vs the XLA auction and the Hungarian
oracle (interpret mode on CPU; the measured win is on-chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.ops.chamfer import pairwise_sqdist
from ured_tpu.ops.emd import _auction_single, emd_reference
from ured_tpu.ops.emd_pallas import auction_assign_pallas, auction_eligible
import jax


def _clouds(n, b=2, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(b, n, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(b, n, 3)), jnp.float32)
    return x, y


def _assign_cost(cost, assign):
    c = np.asarray(cost)
    a = np.asarray(assign)
    return np.take_along_axis(c, a[..., None], axis=-1)[..., 0].mean(-1)


@pytest.mark.slow  # interpret-mode Pallas (~5-10 s each on CPU); value parity vs the XLA
# auction stays fast in test_pallas_auction_matches_xla_value
def test_pallas_auction_bijective_and_eps_optimal():
    n = 128
    x, y = _clouds(n)
    cost = pairwise_sqdist(x, y)
    eps = 0.002
    assign = auction_assign_pallas(cost, eps=eps, iters=10000,
                                   interpret=True)
    a = np.asarray(assign)
    for b in range(a.shape[0]):
        assert len(np.unique(a[b])) == n, "assignment must be bijective"
    approx = _assign_cost(cost, assign)
    exact = emd_reference(x, y)
    assert np.all(approx >= exact - 1e-5)
    assert np.all(approx <= exact + 2 * eps), (approx, exact)


def test_pallas_auction_matches_xla_value():
    """Same eps-optimality as the XLA auction: the two paths' assignment
    costs agree within the auction bound (tie PATTERNS may differ)."""
    n = 128
    x, y = _clouds(n, seed=11)
    cost = pairwise_sqdist(x, y)
    eps = 0.005
    got = auction_assign_pallas(cost, eps=eps, iters=2000, interpret=True)
    want = jax.vmap(_auction_single, in_axes=(0, None, None))(
        cost, eps, 2000)
    assert np.all(np.asarray(got) >= 0)
    assert np.all(np.asarray(want) >= 0)
    np.testing.assert_allclose(_assign_cost(cost, got),
                               _assign_cost(cost, want), atol=2 * eps)


@pytest.mark.slow  # interpret-mode Pallas (~5-10 s each on CPU); value parity vs the XLA
# auction stays fast in test_pallas_auction_matches_xla_value
def test_pallas_auction_early_exit_budget_equivalence():
    """A generous budget and a just-enough budget give identical
    assignments (the while_loop body is a fixed point once all-assigned)."""
    n = 128
    x, y = _clouds(n, seed=5)
    cost = pairwise_sqdist(x, y)
    a1 = auction_assign_pallas(cost, eps=0.005, iters=4000, interpret=True)
    a2 = auction_assign_pallas(cost, eps=0.005, iters=8000, interpret=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.slow  # interpret-mode Pallas (~5-10 s each on CPU); value parity vs the XLA
# auction stays fast in test_pallas_auction_matches_xla_value
def test_fori_fallback_matches_while_loop():
    """early_exit=False (fori_loop insurance path) produces the identical
    assignment — the body is a fixed point once converged."""
    n = 128
    x, y = _clouds(n, seed=9)
    cost = pairwise_sqdist(x, y)
    a_w = auction_assign_pallas(cost, eps=0.005, iters=3000, interpret=True)
    a_f = auction_assign_pallas(cost, eps=0.005, iters=3000, interpret=True,
                                early_exit=False)
    np.testing.assert_array_equal(np.asarray(a_w), np.asarray(a_f))


def test_eligibility_gate():
    assert not auction_eligible(100)     # not lane-aligned
    assert not auction_eligible(2048)    # VMEM budget
    # 1024 is admissible on TPU backends only (CPU test env -> False)
    assert auction_eligible(1024) in (False, True)
