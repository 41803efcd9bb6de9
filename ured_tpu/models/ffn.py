"""Pointwise MLP building blocks.

TPU-native equivalents of the reference Conv1d(kernel=1) stacks
(``attention_graph/attention_utils.py:48-86``).  Layout is channels-last
[..., N, C] — a 1x1 Conv1d is just a Dense applied per point, which XLA maps
straight onto the MXU.  BatchNorm statistics reduce over every axis except
the trailing feature axis, matching torch BatchNorm1d on [B, C, N].
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics ignore invalid rows.

    The reference's ragged per-part loops never fed padded part slots
    through BatchNorm1d (``attention_graph/attention_utils.py:62`` only ever
    saw real parts); the fixed-shape rebuild does, and constant padding rows
    drive the running variances toward 0 — the root cause of the eval-time
    stat collapse that ``recalibrate_batch_stats`` papered over.  Here the
    batch mean/variance are computed over rows with ``mask > 0`` only; with
    ``mask=None`` the math is exactly ``nn.BatchNorm`` (same momentum /
    epsilon / running-stat layout).

    SyncBN: with ``axis_name`` the per-shard (sum, sum-of-squares, count)
    triple is ``psum``'d, which stays exact even when shards carry unequal
    numbers of valid rows (a pmean of per-shard means would not).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None
    # "two_pass": centered second pass (reads x twice; the exactness
    # baseline).  "shifted": one-pass sums of (x - shift) and (x - shift)^2
    # with shift = the running mean (a constant under the step's jit) —
    # halves the HBM reads per BN.  Cancellation amplification is
    # ~(1 + (mean-shift)^2/var): benign whenever the running mean tracks
    # the batch mean (i.e. after the first few steps), unlike the naive
    # E[x^2]-E[x]^2 form whose shift is 0 forever.
    stats_mode: str = "two_pass"

    @nn.compact
    def __call__(self, x, use_running_average: bool, mask=None):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # two-pass (centered) statistics: the one-pass E[x^2] - E[x]^2
            # form cancels catastrophically in f32 when var << mean^2, and
            # the cancellation error is realized differently under the
            # sharded psum order — two-pass keeps single-chip and SyncBN
            # numerics within plain reduction-order noise of each other
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            w = None
            if mask is None:
                cnt = jnp.asarray(
                    float(np.prod(x.shape[:-1])), jnp.float32)
            else:
                w = jnp.broadcast_to(
                    mask.astype(jnp.float32), x.shape[:-1])[..., None]
                cnt = jnp.sum(w)
            if self.stats_mode == "shifted":
                # one read of x: both sums fuse into a single pass
                # (w in {0,1} so masking dx masks dx^2 too)
                shift = jax.lax.stop_gradient(ra_mean.value)
                dx = xf - shift
                if w is not None:
                    dx = dx * w
                s = jnp.sum(dx, axis=axes)
                sv = jnp.sum(dx * dx, axis=axes)
                if self.axis_name is not None:
                    s = jax.lax.psum(s, self.axis_name)
                    sv = jax.lax.psum(sv, self.axis_name)
                    cnt = jax.lax.psum(cnt, self.axis_name)
                cnt = jnp.maximum(cnt, 1.0)
                delta = s / cnt
                mean = shift + delta
                var = jnp.maximum(sv / cnt - jnp.square(delta), 0.0)
            else:
                s = jnp.sum(xf if w is None else xf * w, axis=axes)
                if self.axis_name is not None:
                    s = jax.lax.psum(s, self.axis_name)
                    cnt = jax.lax.psum(cnt, self.axis_name)
                cnt = jnp.maximum(cnt, 1.0)
                mean = s / cnt
                centered_sq = jnp.square(xf - mean)
                if w is not None:
                    centered_sq = centered_sq * w
                sv = jnp.sum(centered_sq, axis=axes)
                if self.axis_name is not None:
                    sv = jax.lax.psum(sv, self.axis_name)
                var = sv / cnt
            if not self.is_initializing() \
                    and self.is_mutable_collection("batch_stats"):
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class PointMLP(nn.Module):
    """Reference ``FeedForwardNet_norm`` (conv -> relu -> norm per layer,
    final layer linear).  ``norm``: 'batch' | 'layer' | 'instance' | 'none'.

    ``dtype`` sets the matmul compute type (bf16 keeps the MXU at full
    rate); parameters and normalization statistics stay float32.
    ``axis_name`` enables SyncBN: batch statistics are reduced over that
    mesh axis, making multi-chip training numerics match single-chip.
    ``mask`` (broadcastable to ``x.shape[:-1]``) marks rows that may
    contribute to batch statistics (padded part slots must not).
    """

    features: Sequence[int]
    norm: str = "batch"
    dtype: Any = None
    axis_name: Optional[str] = None
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode

    @nn.compact
    def __call__(self, x, train: bool = True, mask=None):
        for f in self.features[:-1]:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.relu(x)
            if self.norm == "batch":
                x = MaskedBatchNorm(momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    axis_name=self.axis_name,
                                    stats_mode=self.bn_stats_mode)(
                    x, use_running_average=not train, mask=mask)
            elif self.norm == "layer":
                x = nn.LayerNorm(dtype=self.dtype)(x)
            elif self.norm == "instance":
                # InstanceNorm1d: normalize over the points axis per channel.
                mean = jnp.mean(x, axis=-2, keepdims=True)
                var = jnp.var(x, axis=-2, keepdims=True)
                x = (x - mean) / jnp.sqrt(var + 1e-5)
        return nn.Dense(self.features[-1], dtype=self.dtype)(x)


class ConvBNRelu(nn.Module):
    """conv -> BN -> relu unit (the ordering used inside the encoders,
    ``network/simple_encoder.py:52-70``).  ``axis_name``: SyncBN axis;
    ``mask``: batch-statistic row validity (see ``MaskedBatchNorm``)."""

    features: int
    dtype: Any = None
    axis_name: Optional[str] = None
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode

    @nn.compact
    def __call__(self, x, train: bool = True, mask=None):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            axis_name=self.axis_name,
                            stats_mode=self.bn_stats_mode)(
            x, use_running_average=not train, mask=mask)
        return nn.relu(x)


class SirenMLP(nn.Module):
    """SIREN-initialized pointwise MLP (reference
    ``attention_utils.py:FeedForwardNetSiren:32`` with sin(30x) activations)."""

    features: Sequence[int]
    w0: float = 30.0

    @nn.compact
    def __call__(self, x):
        def siren_init(first):
            def init(key, shape, dtype=jnp.float32):
                fan_in = shape[0]
                if first:
                    bound = 1.0 / fan_in
                else:
                    bound = jnp.sqrt(6.0 / fan_in) / self.w0
                return nn.initializers.uniform(scale=2 * bound)(
                    key, shape, dtype) - bound
            return init

        for i, f in enumerate(self.features[:-1]):
            x = nn.Dense(f, kernel_init=siren_init(i == 0))(x)
            x = jnp.sin(self.w0 * x)
        return nn.Dense(self.features[-1], kernel_init=siren_init(False))(x)
