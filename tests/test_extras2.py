"""Tests: matching head + matrix losses, best-of-k eval, GAN steps,
multi-host helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ured_tpu.config import URedConfig
from ured_tpu.data import synthetic
from ured_tpu.engine.completion import make_gan_steps, CompletionState
from ured_tpu.engine.evaluate import build_source_db, make_eval_step
from ured_tpu.losses.losses import (
    matching_consistency,
    point_loss_matching,
    point_loss_matching_squared,
    regularization_matching_coverage,
    regularization_matching_entropy,
    regularization_matching_max,
)
from ured_tpu.models.completion import PCN, PointDiscriminator
from ured_tpu.models.deformnet import DeformNetMatching
from ured_tpu.models.ured import URED
from ured_tpu.parallel.multihost import init_distributed, is_primary, seed_everything


def test_matching_head(rng):
    b, p, c, n, npts = 2, 4, 16, 32, 64
    m = DeformNetMatching(input_dim=3 * c, graph_dim=c, max_num_parts=p,
                          matching=True, point_f_dim=c, points_num=npts)
    tgt = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(b, p, c)), jnp.float32)
    ppf = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), tgt, src, ppf, train=False)
    (params, matching), _ = m.apply(v, tgt, src, ppf, train=True,
                                    mutable=["batch_stats"])
    assert params.shape == (b, p, 6)
    assert matching.shape == (b, n, npts)
    np.testing.assert_allclose(np.asarray(matching.sum(-1)), 1.0, atol=1e-4)


def test_matching_losses(rng):
    b, n, m_, k = 2, 8, 16, 4
    deformed = jnp.asarray(rng.normal(size=(b, m_, 3)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    mm = jax.nn.softmax(jnp.asarray(rng.normal(size=(b, n, m_))), -1)
    l1 = point_loss_matching(deformed, mm, target)
    l2 = point_loss_matching_squared(deformed, mm, target)
    assert np.isfinite(float(l1)) and l2.shape == (b,)

    # identity matching of identical clouds -> zero loss
    eye = jnp.eye(n)[None].repeat(b, 0)
    z = point_loss_matching(target, eye, target)
    assert float(z) < 1e-7

    rows = jnp.asarray(rng.integers(0, n, size=(b, k)))
    mc = matching_consistency(mm, jax.nn.softmax(
        jnp.asarray(rng.normal(size=(b, k, m_))), -1), rows)
    assert float(mc) >= 0
    # self-consistency is zero
    sel = jnp.take_along_axis(mm, rows[..., None], axis=1)
    np.testing.assert_allclose(float(matching_consistency(mm, sel, rows)),
                               0.0, atol=1e-5)

    logits = jnp.asarray(rng.normal(size=(b, n, m_)), jnp.float32)
    assert float(regularization_matching_entropy(logits)) > 0
    assert 0 < float(regularization_matching_max(mm)) <= 1
    assert 0 < float(regularization_matching_coverage(mm)) <= 1


def test_best_of_k_eval():
    cfg = URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=64,
                     num_part_points=16, sem_latent_dim=8,
                     source_latent_dim=16, target_latent_dim=16,
                     part_latent_dim=16)
    data = synthetic.generate(num_targets=2, num_sources=6, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    model = URED(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in synthetic.make_batch(
        data, np.arange(2), 8).items()}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    src_db = build_source_db(cfg, model, variables,
                             jnp.asarray(data.src_points),
                             jnp.asarray(data.src_sems),
                             jnp.asarray(data.src_mats), chunk=6)
    batch = {"x": jnp.asarray(data.points[:2]),
             "labels": jnp.asarray(data.labels[:2]),
             "tgt_sem": jnp.asarray(data.semantics[:2])}
    step = jax.jit(make_eval_step(cfg, model, k_candidates=3))
    out = step(variables, batch, src_db)
    assert out["topk"].shape == (2, 8, 3)
    # best over k is never worse than the top-1 candidate
    assert np.all(np.asarray(out["cd_best"])
                  <= np.asarray(out["cd_full"]) + 1e-6)

    # the vmapped candidate sweep (candidates_vmap extra) is exact vs the
    # sequential lax.map sweep
    cfg.extras["candidates_vmap"] = True
    out_v = jax.jit(make_eval_step(cfg, model, k_candidates=3))(
        variables, batch, src_db)
    np.testing.assert_allclose(np.asarray(out_v["cd_best"]),
                               np.asarray(out["cd_best"]), rtol=1e-6)


@pytest.mark.slow  # compiles 3 completion nets + 2 GAN steps (~15 s); the completion
# forwards are covered fast in test_completion.py
def test_gan_steps(rng):
    model = PCN(num_coarse=16, grid_size=2)
    disc = PointDiscriminator()
    partial = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    gv = model.init(jax.random.PRNGKey(0), partial, train=False)
    dv = disc.init(jax.random.PRNGKey(1), gt, train=False)
    tx_g, tx_d = optax.adam(1e-3), optax.adam(1e-3)
    g_state = CompletionState(jnp.zeros((), jnp.int32), gv["params"],
                              tx_g.init(gv["params"]))
    d_state = CompletionState(jnp.zeros((), jnp.int32), dv["params"],
                              tx_d.init(dv["params"]))
    g_step, d_step = make_gan_steps(model, disc, tx_g, tx_d)
    d_state, d_loss = jax.jit(d_step)(d_state, g_state.params, partial, gt)
    g_state, g_loss = jax.jit(g_step)(g_state, d_state.params, partial, gt)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))


def test_multihost_single_process():
    info = init_distributed()
    assert info["process_count"] == 1
    assert is_primary()
    s = seed_everything(42)
    assert s == 42
