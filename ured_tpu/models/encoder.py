"""PointNet-style point-cloud encoders.

Port of reference ``network/simple_encoder.py``: shared pointwise MLP
3 -> 64 -> 64 -> 64 -> 128 -> 1024, optional semantic-embedding fusion, a
per-point head, and a max-pooled global code.  Layout is channels-last
[B, N, C]; the source variant folds the parts axis into batch exactly like
the reference's ``is_src`` path (``simple_encoder.py:91-93``) — on TPU that
keeps one big [B*P, n, C] matmul stream on the MXU instead of 16 small ones.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ured_tpu.models.ffn import ConvBNRelu


class STN3D(nn.Module):
    """Spatial transformer predicting a DxD alignment matrix (reference
    ``simple_encoder.py:STN3D:6-41``; defined there but never applied — kept
    for capability parity and usable by the PointNet zoo)."""

    input_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: [B, N, D]
        d = self.input_channels
        h = x
        for f in (64, 128, 1024):
            h = ConvBNRelu(f)(h, train=train)
        h = jnp.max(h, axis=-2)  # [B, 1024]
        for f in (512, 256):
            h = nn.Dense(f)(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(h)
            h = nn.relu(h)
        h = nn.Dense(d * d)(h)
        eye = jnp.eye(d, dtype=h.dtype).reshape(-1)
        return (h + eye).reshape(-1, d, d)


class TargetEncoder(nn.Module):
    """Reference ``TargetEncoder:43-107``.

    Args (call):
      x: [B, N, 3] target clouds, or [B, P, n, 3] source parts if ``is_src``.
      sem_f: semantic embedding features — [B, N, S] per point for targets,
        [B, P, S] per part for sources; None disables fusion.
      valid: optional row validity for batch statistics — [B, P] part
        validity for sources (padded part slots must not contribute to
        BatchNorm statistics, see ``MaskedBatchNorm``), [B, N] per point
        for targets.
    Returns:
      (global code [B(,P), C], per-point features [B(,P), N, C]).
    """

    embedding_size: int = 256
    input_channels: int = 3
    is_src: bool = False
    sem_size: int = 0  # 0 disables semantic fusion
    dtype: Any = None  # matmul compute dtype (bf16 for MXU full rate)
    axis_name: Any = None  # SyncBN mesh axis (reduced batch statistics)
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode

    @nn.compact
    def __call__(self, x, sem_f=None, train: bool = True, valid=None):
        src_shape = None
        if self.is_src:
            b, p, n, c = x.shape
            src_shape = (b, p)
            x = x.reshape(b * p, n, c)
            if sem_f is not None:
                # per-part semantic feature broadcast to every point
                sem_f = jnp.broadcast_to(
                    sem_f.reshape(b * p, 1, -1), (b * p, n, sem_f.shape[-1]))
            if valid is not None:
                # [B, P] part validity -> [B*P, 1] row mask over points
                valid = valid.reshape(b * p, 1)
        n_points = x.shape[-2]

        h = x
        for f in (64, 64):       # mlp1
            h = ConvBNRelu(f, dtype=self.dtype, axis_name=self.axis_name,
                           bn_stats_mode=self.bn_stats_mode)(
                h, train=train, mask=valid)
        for f in (64, 128, 1024):  # mlp2
            h = ConvBNRelu(f, dtype=self.dtype, axis_name=self.axis_name,
                           bn_stats_mode=self.bn_stats_mode)(
                h, train=train, mask=valid)

        if self.sem_size and sem_f is not None:
            h = jnp.concatenate([h, sem_f.astype(h.dtype)], axis=-1)
            h = ConvBNRelu(1024, name="fuse_sem", dtype=self.dtype,
                           axis_name=self.axis_name,
                           bn_stats_mode=self.bn_stats_mode)(h, train=train,
                                                             mask=valid)

        per_point = ConvBNRelu(self.embedding_size, dtype=self.dtype,
                               axis_name=self.axis_name,
                               bn_stats_mode=self.bn_stats_mode,
                               name="per_point_0")(h, train=train,
                                                   mask=valid)
        per_point = nn.Dense(self.embedding_size, dtype=self.dtype,
                             name="per_point_1")(per_point)

        g = jnp.max(h, axis=-2)              # max pool over points
        g = nn.Dense(self.embedding_size, dtype=self.dtype, name="fc")(g)
        g = g.astype(jnp.float32)
        per_point = per_point.astype(jnp.float32)

        if src_shape is not None:
            b, p = src_shape
            g = g.reshape(b, p, -1)
            per_point = per_point.reshape(b, p, n_points, -1)
        return g, per_point


class SrcEncoder(nn.Module):
    """Global-code-only encoder (reference ``SrcEncoder:110-146``; used by the
    alternative ``re_network`` retrieval path)."""

    embedding_size: int = 256
    input_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x[..., : self.input_channels]
        h = x
        for f in (64, 64, 64, 128, 1024):
            h = ConvBNRelu(f)(h, train=train)
        g = jnp.max(h, axis=-2)
        return nn.Dense(self.embedding_size)(g)
