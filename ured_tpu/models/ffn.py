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
import jax.numpy as jnp


class PointMLP(nn.Module):
    """Reference ``FeedForwardNet_norm`` (conv -> relu -> norm per layer,
    final layer linear).  ``norm``: 'batch' | 'layer' | 'instance' | 'none'.

    ``dtype`` sets the matmul compute type (bf16 keeps the MXU at full
    rate); parameters and normalization statistics stay float32.
    ``axis_name`` enables SyncBN: batch statistics are pmean'd over that
    mesh axis, making multi-chip training numerics match single-chip.
    """

    features: Sequence[int]
    norm: str = "batch"
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for f in self.features[:-1]:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.relu(x)
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 axis_name=self.axis_name)(x)
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
    ``network/simple_encoder.py:52-70``).  ``axis_name``: SyncBN axis."""

    features: int
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name)(x)
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
