"""DCD metric tests vs a direct numpy transcription of the reference math
(``utils_v2/model_utils.py:calc_dcd:13-51``)."""

import jax.numpy as jnp
import numpy as np

from ured_tpu.ops import calc_dcd


def _numpy_dcd(x, gt, alpha=1000.0, n_lambda=1.0):
    b, n_x, _ = x.shape
    _, n_gt, _ = gt.shape
    frac_12 = n_x / n_gt
    frac_21 = n_gt / n_x
    out = []
    for i in range(b):
        d = np.sum((gt[i][:, None] - x[i][None]) ** 2, -1)  # [n_gt, n_x]
        dist1, idx1 = d.min(1), d.argmin(1)
        dist2, idx2 = d.min(0), d.argmin(0)
        exp1, exp2 = np.exp(-dist1 * alpha), np.exp(-dist2 * alpha)
        cnt1 = np.bincount(idx1, minlength=n_x).astype(np.float64)
        w1 = cnt1[idx1] ** n_lambda
        w1 = 1.0 / (w1 + 1e-6) * frac_21
        loss1 = np.mean(1 - exp1 * w1)
        cnt2 = np.bincount(idx2, minlength=n_gt).astype(np.float64)
        w2 = cnt2[idx2] ** n_lambda
        w2 = 1.0 / (w2 + 1e-6) * frac_12
        loss2 = np.mean(1 - exp2 * w2)
        out.append((loss1 + loss2) / 2)
    return np.array(out)


def test_dcd_matches_numpy(rng):
    x = rng.normal(size=(2, 48, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 64, 3)).astype(np.float32)
    loss, cd_p, cd_t = calc_dcd(jnp.asarray(x), jnp.asarray(gt))
    want = _numpy_dcd(x, gt)
    np.testing.assert_allclose(loss, want, atol=1e-4)


def test_dcd_identical_is_small(rng):
    x = rng.normal(size=(1, 64, 3)).astype(np.float32)
    loss, _, _ = calc_dcd(jnp.asarray(x), jnp.asarray(x))
    # identical clouds: exp(0)=1 and every point matched once -> weight ~1
    assert float(loss[0]) < 1e-4


def test_dcd_bounded(rng):
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 32, 3)).astype(np.float32) + 10.0
    loss, _, _ = calc_dcd(jnp.asarray(x), jnp.asarray(gt))
    assert np.all(np.asarray(loss) <= 1.0 + 1e-6)
