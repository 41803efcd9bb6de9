"""Vector Neuron (VN) layers and VN-DGCNN encoders.

Rotation-equivariant point features (Deng et al., "Vector Neurons", 2021) —
the capability of reference ``network/VN/vn_layers.py`` / ``vn_encoder.py`` /
``vn_retrieval.py`` / ``vn_dgcnn_util.py`` rebuilt for TPU.

Layout: vector-valued features are [..., N, C, 3] (vector axis LAST, so the
channel mixing ``W @ x`` is a plain einsum on the MXU and the 3-axis stays
contiguous in lanes).  Equivariance contract (tested):
``layer(x @ R) == layer(x) @ R`` for every rotation R; ``VNStdFeature``
output is rotation-invariant.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.ops.knn import knn_points

Array = jax.Array

EPS = 1e-6


class VNLinear(nn.Module):
    """Channel-mixing linear map on vector features (ref ``VNLinear:13``)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [..., C_in, 3]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-2], self.out_channels))
        return jnp.einsum("...cv,cd->...dv", x, w)


class VNLeakyReLU(nn.Module):
    """Direction-gated leaky ReLU (ref ``VNLeakyReLU:26``): project each
    vector feature onto a learned direction; vectors on the negative side
    lose their component along it."""

    negative_slope: float = 0.2
    share_nonlinearity: bool = False

    @nn.compact
    def __call__(self, q: Array) -> Array:
        out_ch = 1 if self.share_nonlinearity else q.shape[-2]
        w = self.param("dir_kernel", nn.initializers.lecun_normal(),
                       (q.shape[-2], out_ch))
        d = jnp.einsum("...cv,cd->...dv", q, w)
        if self.share_nonlinearity:
            d = jnp.broadcast_to(d, q.shape)
        dot = jnp.sum(q * d, axis=-1, keepdims=True)
        d_norm_sq = jnp.sum(d * d, axis=-1, keepdims=True)
        mask = (dot >= 0).astype(q.dtype)
        q_neg = q - (dot / (d_norm_sq + EPS)) * d
        rectified = mask * q + (1.0 - mask) * q_neg
        return self.negative_slope * q + \
            (1.0 - self.negative_slope) * rectified


class VNBatchNorm(nn.Module):
    """BatchNorm on vector norms (ref ``VNBatchNorm:112``): normalizes the
    per-channel magnitudes, preserving directions (hence equivariance)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1) + EPS)      # [..., C]
        norm_bn = nn.BatchNorm(use_running_average=not train,
                               momentum=0.9, epsilon=1e-5)(norm)
        return x / norm[..., None] * norm_bn[..., None]


class VNLinearLeakyReLU(nn.Module):
    """Linear -> (BN) -> leaky relu block (ref ``VNLinearLeakyReLU:48``)."""

    out_channels: int
    use_batchnorm: bool = True
    negative_slope: float = 0.2
    share_nonlinearity: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = VNLinear(self.out_channels)(x)
        if self.use_batchnorm:
            x = VNBatchNorm()(x, train=train)
        return VNLeakyReLU(self.negative_slope,
                           self.share_nonlinearity)(x)


class VNMaxPool(nn.Module):
    """Pool over one axis by the learned-direction inner product
    (ref ``VNMaxPool:135``): per channel, keep the sample whose projection
    onto a learned (equivariantly transformed) direction is largest.

    ``axis`` selects the pooled sample axis: the default 1 pools points
    ([B, N, C, 3] -> [B, C, 3]); axis=2 pools kNN neighbors inside edge
    convs ([B, N, k, C, 3] -> [B, N, C, 3]), the role ``cfg['pooling'] ==
    'max'`` plays in ref ``vn_encoder.py:31-40``."""

    axis: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("dir_kernel", nn.initializers.lecun_normal(),
                       (x.shape[-2], x.shape[-2]))
        d = jnp.einsum("...cv,cd->...dv", x, w)
        dot = jnp.sum(x * d, axis=-1)                     # [..., C]
        idx = jnp.argmax(dot, axis=self.axis)
        sel = jnp.expand_dims(idx[..., None], self.axis)  # [..., 1, C, 1]
        return jnp.take_along_axis(x, sel, axis=self.axis).squeeze(self.axis)


def vn_mean_pool(x: Array) -> Array:
    return jnp.mean(x, axis=1)


class VNStdFeature(nn.Module):
    """Rotation-invariant standard feature (ref ``VNStdFeature:156``): learn
    a 3-vector frame from the features and express them in it."""

    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True
                 ) -> Tuple[Array, Array]:
        c = x.shape[-2]
        z = VNLinearLeakyReLU(c // 2, self.use_batchnorm)(x, train=train)
        z = VNLinearLeakyReLU(c // 4, self.use_batchnorm)(z, train=train)
        frame = VNLinear(3)(z)                            # [..., 3, 3]
        # invariant coordinates: <x_c, frame_k>
        inv = jnp.einsum("...cv,...kv->...ck", x, frame)
        return inv, frame


def vn_graph_feature(x: Array, k: int, cross: bool = False) -> Array:
    """Edge features for VN-DGCNN (ref ``vn_dgcnn_util.py:get_graph_feature:
    20`` / ``get_graph_feature_cross:50``).

    x: [B, N, C, 3] -> [B, N, k, C', 3] with C' = 2C (+C if cross).
    """
    b, n, c, _ = x.shape
    flat = x.reshape(b, n, c * 3)
    idx = knn_points(flat, flat, k).idx                   # [B, N, k]
    nbr = jax.vmap(lambda xx, ii: xx[ii])(x, idx)         # [B, N, k, C, 3]
    ctr = jnp.broadcast_to(x[:, :, None], nbr.shape)
    feats = [nbr - ctr, ctr]
    if cross:
        feats.append(jnp.cross(nbr, ctr))
    return jnp.concatenate(feats, axis=-2)


class VNEncoder(nn.Module):
    """VN-DGCNN encoder (ref ``vn_encoder.py:vn_encoder:8``): stacked
    edge-conv VN blocks, invariant std feature, global + per-point outputs.
    """

    embedding_size: int = 256
    k: int = 20
    per_point: bool = True
    pooling: str = "mean"  # 'mean' | 'max' — neighbor pool, ref vn_encoder.py:31

    def _pool_k(self, e: Array) -> Array:
        """Neighbor pool [B, N, k, C, 3] -> [B, N, C, 3] per cfg['pooling']."""
        if self.pooling == "max":
            return VNMaxPool(axis=2)(e)
        return jnp.mean(e, axis=2)

    @nn.compact
    def __call__(self, points: Array, train: bool = True):
        # points: [B, N, 3] -> vector features [B, N, 1, 3]
        x = points[..., None, :]
        e = vn_graph_feature(x, self.k, cross=True)       # [B, N, k, 3, 3]
        e = VNLinearLeakyReLU(64 // 3)(e, train=train)
        x1 = self._pool_k(e)

        feats = [x1]
        x = x1
        for ch in (64 // 3, 128 // 3, 256 // 3):
            e = vn_graph_feature(x, self.k)               # [B, N, k, 2C, 3]
            e = VNLinearLeakyReLU(ch)(e, train=train)
            x = self._pool_k(e)
            feats.append(x)

        x = jnp.concatenate(feats, axis=-2)               # [B, N, Csum, 3]
        x = VNLinearLeakyReLU(1024 // 3,
                              share_nonlinearity=True)(x, train=train)
        # global-context concat before the invariant map (ref :66-67)
        x_mean = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
        x = jnp.concatenate([x, x_mean], axis=-2)         # [B, N, 2C', 3]
        inv, _ = VNStdFeature()(x, train=train)           # [B, N, 2C', 3] inv
        b, n = inv.shape[0], inv.shape[1]
        inv = inv.reshape(b, n, -1)

        # invariant head: max+avg global pools -> 512 BN leaky -> embedding
        # (ref vn_encoder.py:74-81)
        g = jnp.concatenate([jnp.max(inv, axis=1),
                             jnp.mean(inv, axis=1)], axis=-1)
        g = nn.Dense(512)(g)
        g = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9, epsilon=1e-5)(g)
        g = nn.leaky_relu(g, negative_slope=0.2)
        g = nn.Dense(self.embedding_size)(g)
        if not self.per_point:
            return g
        pp = nn.Dense(self.embedding_size)(inv)
        return g, pp

    @classmethod
    def from_config(cls, cfg, per_point: bool = True) -> "VNEncoder":
        """Build from a :class:`URedConfig` the way ref ``vn_encoder.py:8``
        reads its cfg dict (``n_knn``, ``pooling``, ``target_latent_dim``)."""
        return cls(embedding_size=cfg.target_latent_dim, k=cfg.n_knn,
                   per_point=per_point, pooling=cfg.pooling)


class VNRetrieval(nn.Module):
    """Global-only VN encoder for retrieval (ref ``vn_retrieval.py:8`` —
    identical to ``vn_encoder`` minus the per-point head)."""

    embedding_size: int = 256
    k: int = 20
    pooling: str = "mean"

    @nn.compact
    def __call__(self, points: Array, train: bool = True) -> Array:
        return VNEncoder(self.embedding_size, self.k, per_point=False,
                         pooling=self.pooling)(points, train=train)

    @classmethod
    def from_config(cls, cfg) -> "VNRetrieval":
        return cls(embedding_size=cfg.target_latent_dim, k=cfg.n_knn,
                   pooling=cfg.pooling)
