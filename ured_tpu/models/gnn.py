"""Graph attention network over (global nodes, part nodes).

Port of reference ``attention_graph/attention_gnn.py:35-104``: alternating
self / cross attention stages, each a residual message-propagation block
(MHA -> concat(query, message) -> FFN -> residual).  Parameter sharing
mirrors the reference exactly: within a stage, the *same* block processes
both node sets.

Layout: node descriptors are [B, N, C] (channels last).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ured_tpu.models.attention import MultiheadAttention
from ured_tpu.models.ffn import PointMLP


class ResidualAttentionBlock(nn.Module):
    """Reference ``ResidualAttentionMessagePropagation:35-55``."""

    embed_dim: int
    num_heads: int
    attention: str = "softmax"
    use_offset: bool = False  # offset-attention (arXiv:2012.09688) variant
    norm: str = "batch"
    axis_name: str = None  # SyncBN mesh axis
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode
    mask_attention: bool = False  # padded KEY nodes get zero attention

    @nn.compact
    def __call__(self, desc_q, desc_kv, train: bool = True, mask=None,
                 kv_mask=None):
        """``mask`` [B, Nq]: query-node validity for batch statistics —
        padded part nodes must not pollute the FFN's BatchNorm stats.
        ``kv_mask`` [B, Nkv]: key validity, applied only under
        ``mask_attention`` (the reference attends to padding unmasked)."""
        message, _ = MultiheadAttention(
            self.embed_dim, self.num_heads, self.attention,
            name="mha")(desc_q, desc_kv, desc_kv,
                        key_mask=kv_mask if self.mask_attention else None)
        if self.use_offset:
            cat = jnp.concatenate([desc_q - message, message], axis=-1)
        else:
            cat = jnp.concatenate([desc_q, message], axis=-1)
        ffn = PointMLP([2 * self.embed_dim, self.embed_dim],
                       norm=self.norm, axis_name=self.axis_name,
                       bn_stats_mode=self.bn_stats_mode,
                       name="fc")(cat, train=train, mask=mask)
        return desc_q + ffn


class GraphAttentionNet(nn.Module):
    """Reference ``GraphAttentionNet:85-104``: ``num_stages`` repetitions of
    (self-attention on each node set, then cross-attention between them),
    with the block weights shared across the two node sets per layer."""

    num_stages: int
    embed_dim: int
    num_heads: int
    attention: str = "softmax"
    use_offset: bool = False
    axis_name: str = None  # SyncBN mesh axis
    bn_stats_mode: str = "two_pass"  # see MaskedBatchNorm.stats_mode
    mask_attention: bool = False  # padded KEY nodes get zero attention

    @nn.compact
    def __call__(self, desc0, desc1, train: bool = True,
                 mask0=None, mask1=None):
        """``mask0``/``mask1`` [B, N0]/[B, N1]: node validity per set,
        forwarded as the batch-statistic row masks of the shared blocks
        (and, under ``mask_attention``, as key masks so padded nodes stop
        influencing real ones)."""
        for s in range(self.num_stages):
            self_block = ResidualAttentionBlock(
                self.embed_dim, self.num_heads, self.attention,
                self.use_offset, axis_name=self.axis_name,
                bn_stats_mode=self.bn_stats_mode,
                mask_attention=self.mask_attention, name=f"self_{s}")
            desc0 = self_block(desc0, desc0, train=train, mask=mask0,
                               kv_mask=mask0)
            desc1 = self_block(desc1, desc1, train=train, mask=mask1,
                               kv_mask=mask1)

            cross_block = ResidualAttentionBlock(
                self.embed_dim, self.num_heads, self.attention,
                self.use_offset, axis_name=self.axis_name,
                bn_stats_mode=self.bn_stats_mode,
                mask_attention=self.mask_attention,
                name=f"cross_{s}")
            desc0 = cross_block(desc0, desc1, train=train, mask=mask0,
                                kv_mask=mask1)
            desc1 = cross_block(desc1, desc0, train=train, mask=mask1,
                                kv_mask=mask0)
        return desc0, desc1
