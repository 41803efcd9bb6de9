"""Alternative / legacy network designs kept for capability parity.

  * ``ReNetwork``      <- reference ``network/re_network.py:re_network:53``:
    VN target encoder + simple source encoder + order-MLP over (src, tgt)
    code pairs -> sigmoid rank score.
  * ``MLPPositionalEncoding`` <- ``attention_graph/position_encoding.py:7``.
  * ``DeformNetDesign1/2``    <- ``attention_graph/Deformation_net.py:46,87``
    (older deform decoders: plain MLP and two-stage MLP + graph residual).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.models.encoder import SrcEncoder
from ured_tpu.models.ffn import PointMLP
from ured_tpu.models.gnn import GraphAttentionNet
from ured_tpu.models.vn import VNRetrieval

Array = jax.Array


class ReNetwork(nn.Module):
    """Rank-score retrieval network (ref ``re_network.py:53-82``)."""

    latent_dim: int = 256
    k_neighbors: int = 20

    @nn.compact
    def __call__(self, src_points: Array, tgt_points: Array,
                 train: bool = True) -> Array:
        """src_points [B, n, 3], tgt_points [B, m, 3] -> scores [B, 1]
        in (0, 1): predicted retrieval quality of the pair."""
        tgt_code = VNRetrieval(self.latent_dim, self.k_neighbors)(
            tgt_points, train=train)
        src_code = SrcEncoder(self.latent_dim)(src_points, train=train)
        pair = jnp.concatenate([src_code, tgt_code], axis=-1)
        h = nn.relu(nn.Dense(self.latent_dim)(pair))
        h = nn.relu(nn.Dense(self.latent_dim // 4)(h))
        return nn.sigmoid(nn.Dense(1)(h))


class MLPPositionalEncoding(nn.Module):
    """2D keypoint + side-info positional encoding (ref
    ``position_encoding.py:7-19``)."""

    embed_dim: int = 128

    @nn.compact
    def __call__(self, kpts: Array, side_info: Array) -> Array:
        x = jnp.concatenate([kpts, side_info], axis=-1)
        return PointMLP([32, 64, self.embed_dim], norm="none")(x)


class DeformNetDesign1(nn.Module):
    """Plain MLP deform decoder over concat(global, target, part) codes
    (ref ``Deformation_net.py:DeformNet_design1:46``)."""

    output_dim: int = 6

    @nn.compact
    def __call__(self, global_f: Array, target_f: Array,
                 part_f: Array, train: bool = True) -> Array:
        # global_f/target_f [B, C]; part_f [B, P, Cp]
        b, p, _ = part_f.shape
        ctx = jnp.concatenate([global_f, target_f], axis=-1)[:, None]
        ctx = jnp.broadcast_to(ctx, (b, p, ctx.shape[-1]))
        h = jnp.concatenate([ctx, part_f], axis=-1)
        return PointMLP([256, 128, self.output_dim],
                        norm="none")(h, train=train)


class DeformNetDesign2(nn.Module):
    """Two-stage decoder: MLP init then graph-attention residual refinement
    (ref ``Deformation_net.py:DeformNet_design2:87``)."""

    graph_dim: int = 128
    num_stages: int = 2
    num_heads: int = 4
    output_dim: int = 6

    @nn.compact
    def __call__(self, global_f: Array, target_f: Array,
                 part_f: Array, train: bool = True) -> Array:
        coarse = DeformNetDesign1(self.output_dim)(
            global_f, target_f, part_f, train=train)
        nodes = PointMLP([self.graph_dim], norm="none")(part_f)
        ctx = jnp.stack([global_f, target_f], axis=1)
        ctx = PointMLP([self.graph_dim], norm="none")(ctx)
        _, refined = GraphAttentionNet(
            self.num_stages, self.graph_dim, self.num_heads)(
                ctx, nodes, train=train)
        delta = PointMLP([64, self.output_dim], norm="none")(
            refined, train=train)
        return coarse + delta
