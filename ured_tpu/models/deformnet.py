"""Deformation-parameter decoder and residual networks.

Ports of reference ``network/deformation_net.py``:

* ``DeformNetMatching`` (ref ``DeformNet_MatchingNet:43-93``): builds a
  2-node global graph (mean source code, target code), runs it against the
  16 part nodes through the graph-attention stack, concatenates the attended
  global context onto every part node, and MLP-decodes 6 deformation
  parameters per part.
* ``ResidualNet`` (ref ``re_residual_net:96-107``): per-point MLP
  [in -> 256 -> 256 -> 32 -> 3] predicting 3-vectors; instantiated three
  times in the engine (target recon, source recon, retrieval residuals —
  ref ``engine/train.py:41,44,76``).
* ``NodeDecoder`` (ref ``NodeDecoder:10-40``): small 2-layer node head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.models.ffn import PointMLP
from ured_tpu.models.gnn import GraphAttentionNet


class NodeDecoder(nn.Module):
    intermediate: int
    embedding_size: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.intermediate)(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
        elif self.norm == "layer":
            x = nn.LayerNorm()(x)
        x = nn.relu(x)
        return nn.Dense(self.embedding_size)(x)


class DeformNetMatching(nn.Module):
    """Graph-attention deformation decoder.

    Live configuration (ref ``engine/train.py:46-47``): ``input_dim`` =
    3 * source_latent_dim, ``graph_dim`` = source_latent_dim, 2 stages,
    4 heads, 6 output params, matching head disabled.
    """

    input_dim: int
    num_stages: int = 2
    num_heads: int = 4
    part_latent_dim: int = 256
    graph_dim: int = 128
    output_dim: int = 6
    use_offset: bool = False
    point_f_dim: int = 256
    points_num: int = 2048
    max_num_parts: int = 16
    matching: bool = False
    attention: str = "softmax"
    axis_name: Any = None  # SyncBN mesh axis
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode
    mask_attention: bool = False  # padded KEY nodes get zero attention

    @nn.compact
    def __call__(self, target_f, src_part_f, per_point_f=None,
                 train: bool = True, part_mask=None):
        """target_f: [B, C]; src_part_f: [B, P, C]; per_point_f unused in the
        live path (kept for signature parity with ref ``forward:74``).
        ``part_mask`` [B, P]: valid part nodes — padded slots are excluded
        from the graph stack's BatchNorm statistics.
        Returns params [B, P, output_dim]."""
        # Defined-but-unused in the reference forward; kept for checkpoint
        # surface parity (ref ``deformation_net.py:60``).
        part_encoding = PointMLP(  # noqa: F841
            [128, self.graph_dim], norm="none", name="part_encoding")

        if self.mask_attention and part_mask is not None:
            # masked mean: the global source node must not ingest padding
            w = part_mask[..., None]
            global_src_f = jnp.sum(src_part_f * w, axis=1) / \
                jnp.maximum(jnp.sum(w, axis=1), 1e-6)
        else:  # reference parity: plain mean over all slots (ref :84)
            global_src_f = jnp.mean(src_part_f, axis=1)       # [B, C]
        global_node = jnp.stack([global_src_f, target_f], axis=1)  # [B, 2, C]

        gat = GraphAttentionNet(self.num_stages, self.graph_dim,
                                self.num_heads, self.attention,
                                self.use_offset, axis_name=self.axis_name,
                                bn_stats_mode=self.bn_stats_mode,
                                mask_attention=self.mask_attention,
                                name="graph_attention_net")
        global_a, part_a = gat(global_node, src_part_f, train=train,
                               mask1=part_mask)

        p = part_a.shape[1]
        global_ctx = global_a.reshape(global_a.shape[0], 1, -1)  # [B, 1, 2C]
        global_ctx = jnp.broadcast_to(
            global_ctx, (global_ctx.shape[0], p, global_ctx.shape[-1]))
        full = jnp.concatenate([global_ctx, part_a], axis=-1)  # [B, P, 3C]

        params = PointMLP([256, self.output_dim], norm="none",
                          name="param_decoder")(full, train=train)
        if not self.matching:
            return params

        # matching head (ref ``deformation_net.py:66-72``): per target point,
        # logits over the deformed cloud's points_num positions, from
        # concat(per-point feature, attended global context)
        if per_point_f is None:
            raise ValueError("matching=True needs per_point_f")
        b, n, _ = per_point_f.shape
        ctx = jnp.broadcast_to(
            global_a.reshape(b, 1, -1), (b, n, 2 * self.graph_dim))
        m_in = jnp.concatenate([per_point_f, ctx], axis=-1)
        matching = PointMLP([512, 1024, self.points_num], norm="batch",
                            name="matching_net")(m_in, train=train)
        return params, jax.nn.softmax(matching, axis=-1)


class ResidualNet(nn.Module):
    """Per-point residual predictor (ref ``re_residual_net:96-107``)."""

    input_dim: int
    output_dim: int = 3
    dtype: Any = None
    axis_name: Any = None  # SyncBN mesh axis
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode

    @nn.compact
    def __call__(self, concat_feature, train: bool = True, mask=None):
        """concat_feature: [B, N, input_dim] -> [B, N, output_dim].
        ``mask`` (broadcastable to [B, N]) gates batch-statistic rows."""
        assert concat_feature.shape[-1] == self.input_dim
        out = PointMLP([256, 256, 32, self.output_dim], norm="batch",
                       dtype=self.dtype, axis_name=self.axis_name,
                       bn_stats_mode=self.bn_stats_mode,
                       name="residual_net")(concat_feature, train=train,
                                            mask=mask)
        return out.astype(jnp.float32)
