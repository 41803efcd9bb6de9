"""Masked BatchNorm: padded part slots must not poison batch statistics.

Root-cause fix for the round-2 eval-time stat collapse: the reference's
ragged loops never fed padded parts through BatchNorm1d
(``attention_graph/attention_utils.py:62``); the fixed-shape rebuild does,
and constant padding rows drove running variances toward ~1e-22, making
``recalibrate_batch_stats`` necessary.  With ``MaskedBatchNorm`` the stats
are computed over valid rows only and eval works without recalibration.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ured_tpu.models.ffn import MaskedBatchNorm
import pytest


def test_masked_stats_equal_stats_of_valid_rows():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(loc=2.0, size=(8, 5, 16)), jnp.float32)
    mask = jnp.asarray((rng.uniform(size=(8, 5)) > 0.5), jnp.float32)

    bn = MaskedBatchNorm()
    vars0 = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    _, st = bn.apply(vars0, x, use_running_average=False, mask=mask,
                     mutable=["batch_stats"])

    valid = np.asarray(x).reshape(-1, 16)[np.asarray(mask).ravel() > 0]
    m = 0.9
    want_mean = (1 - m) * valid.mean(axis=0)          # ra starts at 0
    want_var = m * 1.0 + (1 - m) * valid.var(axis=0)  # ra starts at 1
    np.testing.assert_allclose(st["batch_stats"]["mean"], want_mean,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(st["batch_stats"]["var"], want_var,
                               rtol=1e-5, atol=1e-6)


def test_unmasked_matches_flax_batchnorm():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 7, 8)), jnp.float32)

    ours = MaskedBatchNorm()
    v1 = ours.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y1, s1 = ours.apply(v1, x, use_running_average=False,
                        mutable=["batch_stats"])

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5)
    v2 = ref.init(jax.random.PRNGKey(0), x)
    y2, s2 = ref.apply(v2, x, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(s1["batch_stats"]["mean"],
                               s2["batch_stats"]["mean"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(s1["batch_stats"]["var"],
                               s2["batch_stats"]["var"], rtol=1e-4,
                               atol=1e-6)


def test_eval_uses_running_stats_mask_irrelevant():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 3, 8)), jnp.float32)
    bn = MaskedBatchNorm()
    v = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y1 = bn.apply(v, x, use_running_average=True)
    y2 = bn.apply(v, x, use_running_average=True,
                  mask=jnp.zeros((4, 3)))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.slow
def test_trained_running_vars_do_not_collapse():
    """Training with 75%-padded part slots keeps every URED running
    variance healthy (the collapse signature was ~1e-22) and eval without
    recalibration stays within 2x of the recalibrated number."""
    import dataclasses

    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.engine.evaluate import evaluate
    from ured_tpu.engine.train import train
    from ured_tpu.models.ured import URED

    cfg = URedConfig(batch_size=8, MAX_NUM_PARTS=8, num_target_points=64,
                     num_part_points=16, sem_latent_dim=8,
                     source_latent_dim=16, target_latent_dim=16,
                     part_latent_dim=16, epochs=1, seed=0)
    cfg.extras["ndcg_sigma"] = 0.1
    # max_parts=8 but only 2-4 real parts per target -> >=50% padded slots
    data = synthetic.generate(num_targets=16, num_sources=8, n_points=64,
                              points_per_part=16, max_parts=8, seed=0)
    state, _ = train(cfg, num_steps=12, data=data)

    min_var = min(float(np.min(np.asarray(v)))
                  for path, v in
                  jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]
                  if "var" in jax.tree_util.keystr(path))
    assert min_var > 1e-8, f"running variance collapsed: {min_var}"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = URED(cfg)
    plain = evaluate(cfg, model, variables, data)

    recal_cfg = dataclasses.replace(cfg, extras=dict(cfg.extras))
    recal_cfg.extras["bn_recalibration_passes"] = 1
    recal = evaluate(recal_cfg, model, variables, data)

    assert np.isfinite(plain["cd_loss_top1"])
    assert plain["cd_loss_top1"] <= 2.0 * recal["cd_loss_top1"] + 1e-4, \
        (plain["cd_loss_top1"], recal["cd_loss_top1"])


def test_shifted_stats_match_two_pass():
    """The one-pass shifted-variance mode (shift = running mean) must agree
    with the two-pass baseline once the running mean tracks the data —
    its validity contract.  (With a far-off shift — e.g. a freshly-zeroed
    running mean against mean/std ~ 300 — the cancellation error is real;
    that regime is why two_pass stays the default.)"""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(loc=30.0, scale=0.1, size=(8, 5, 16)),
                    jnp.float32)
    mask = jnp.asarray((rng.uniform(size=(8, 5)) > 0.4), jnp.float32)

    for m in (None, mask):
        outs = {}
        for mode in ("two_pass", "shifted"):
            bn = MaskedBatchNorm(stats_mode=mode)
            vars0 = bn.init(jax.random.PRNGKey(0), x,
                            use_running_average=False)
            # tracking regime: running mean near the batch mean
            bs = dict(vars0["batch_stats"])
            bs["mean"] = jnp.full_like(bs["mean"], 30.0)
            v1 = {"params": vars0.get("params", {}), "batch_stats": bs}
            y, st2 = bn.apply(v1, x, use_running_average=False, mask=m,
                              mutable=["batch_stats"])
            outs[mode] = (np.asarray(y), st2["batch_stats"])
        np.testing.assert_allclose(outs["shifted"][0], outs["two_pass"][0],
                                   rtol=1e-3, atol=5e-4)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(outs["shifted"][1][k]),
                np.asarray(outs["two_pass"][1][k]), rtol=1e-3, atol=1e-5)


@pytest.mark.slow  # 1-core lane budget: full URED compile just to probe plumbing; the shifted/two_pass parity + module tests stay fast
def test_bn_stats_mode_extra_reaches_every_bn():
    """cfg.extras['bn_stats_mode'] must thread down to every MaskedBatchNorm
    in the assembled URED tree (encoders, residual decoders, graph stack),
    and the two modes must produce near-identical forwards on fresh stats
    (running mean == init zeros is the shifted mode's worst case at
    unit-scale data — agreement here bounds the cancellation error)."""
    from ured_tpu.config import URedConfig
    from ured_tpu.data import synthetic
    from ured_tpu.models.ured import URED

    data = synthetic.generate(num_targets=2, num_sources=8, n_points=96,
                              points_per_part=16, max_parts=8, seed=0)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.make_batch(data, np.arange(2), 8).items()}
    outs = {}
    for mode in ("two_pass", "shifted"):
        cfg = URedConfig(batch_size=2, MAX_NUM_PARTS=8, num_target_points=96,
                         num_part_points=16, target_latent_dim=32,
                         source_latent_dim=32, sem_latent_dim=8,
                         part_latent_dim=16)
        cfg.extras["bn_stats_mode"] = mode
        m = URED(cfg)
        v = m.init(jax.random.PRNGKey(0), batch, train=True)
        out, _ = m.apply(v, batch, train=True, mutable=["batch_stats"])
        outs[mode] = np.asarray(out["deformed"])
    # compare valid part slots only: padded slots carry garbage features
    # (excluded from BN stats and from every loss) whose deform params
    # amplify reduction-order noise arbitrarily
    valid = np.asarray(batch["src_valid"]) > 0
    np.testing.assert_allclose(outs["shifted"][valid], outs["two_pass"][valid],
                               rtol=1e-3, atol=1e-2)
