"""3D-GCN surface-kernel encoder (FS-Net style).

Capability port of reference ``network/P_3DGC.py`` + ``network/gc3d_encoder.py``:
direction-kernel convolutions over kNN graphs.  Each kernel carries one
learnable unit "support direction" per (support, output-channel) pair; a
neighbor's contribution is gated by the ReLU'd cosine between its offset
direction and the support (``Conv_surface:72`` / ``Conv_layer:115``), the
receptive field takes the max over neighbors per support and sums over
supports, pooling takes neighborhood maxima, and the encoder fuses five
scales into global + per-point codes (``gc3d_encoder.py:41-80``).

Everything is einsum/gather over [B, N, k, ...] tensors: the direction
cosines and feature mixing ride the MXU; the gated [B, N, k, S*C] product
feeds straight into a (max, sum) reduction so XLA keeps it in registers; no
python loops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.ops.knn import knn_points

Array = jax.Array

EPS = 1e-8


def _uniform_sym(scale: float):
    """U(-scale, scale) initializer (torch ``data.uniform_(-stdv, stdv)``)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def knn_indices(points: Array, k: int) -> Array:
    """k nearest neighbors excluding self (ref ``get_neighbor_index:15``):
    [B, N, k]."""
    idx = knn_points(points, points, k + 1).idx
    return idx[..., 1:]


def neighbor_directions(points: Array, idx: Array) -> Array:
    """Unit offset directions to each neighbor (ref
    ``get_neighbor_direction_norm:61``): [B, N, k, 3]."""
    nbr = jax.vmap(lambda p, i: p[i])(points, idx)
    off = nbr - points[:, :, None, :]
    return off / (jnp.linalg.norm(off, axis=-1, keepdims=True) + EPS)


def _gate_max_sum(theta: Array, feat: Array, support_num: int) -> Array:
    """relu-cosine gate -> max over neighbors -> sum over supports (the
    receptive-field reduction shared by both conv layers, ref
    ``Conv_surface:108-112`` / ``Conv_layer:158-163``).

    theta, feat: [B, N, k, S*C] -> [B, N, C].
    """
    b, n, k, sc = theta.shape
    act = (theta * feat).reshape(b, n, k, support_num, sc // support_num)
    return jnp.sum(jnp.max(act, axis=2), axis=2)


class ConvSurface(nn.Module):
    """First-layer surface convolution: geometry only (ref
    ``Conv_surface:72``).  One learnable direction per (support, kernel)
    pair; output [B, N, kernel_num]."""

    kernel_num: int
    support_num: int

    @nn.compact
    def __call__(self, points: Array, idx: Array) -> Array:
        sk = self.support_num * self.kernel_num
        stdv = 1.0 / (sk ** 0.5)
        directions = self.param("directions", _uniform_sym(stdv), (3, sk))
        d = directions / (jnp.linalg.norm(directions, axis=0,
                                          keepdims=True) + EPS)
        nbr_dir = neighbor_directions(points, idx)        # [B, N, k, 3]
        theta = nn.relu(jnp.einsum("bnkv,vm->bnkm", nbr_dir, d))
        ones = jnp.ones_like(theta)
        return _gate_max_sum(theta, ones, self.support_num)


class ConvLayer(nn.Module):
    """General 3D-GC layer: center linear path + direction-gated neighbor
    support features (ref ``Conv_layer:115``)."""

    out_channels: int
    support_num: int

    @nn.compact
    def __call__(self, points: Array, features: Array, idx: Array) -> Array:
        in_ch = features.shape[-1]
        s, c = self.support_num, self.out_channels
        stdv = 1.0 / ((c * (s + 1)) ** 0.5)
        weights = self.param("weights", _uniform_sym(stdv),
                             (in_ch, (s + 1) * c))
        bias = self.param("bias", _uniform_sym(stdv), ((s + 1) * c,))
        directions = self.param("directions", _uniform_sym(stdv), (3, s * c))

        d = directions / (jnp.linalg.norm(directions, axis=0,
                                          keepdims=True) + EPS)
        feature_out = features @ weights + bias           # [B, N, (s+1)c]
        center = feature_out[..., :c]
        support = feature_out[..., c:]                    # [B, N, s*c]

        sup_nbr = jax.vmap(lambda f, i: f[i])(support, idx)  # [B, N, k, s*c]
        nbr_dir = neighbor_directions(points, idx)
        theta = nn.relu(jnp.einsum("bnkv,vm->bnkm", nbr_dir, d))
        return center + _gate_max_sum(theta, sup_nbr, s)


class PoolLayer(nn.Module):
    """Neighborhood max-pool + subsampling (ref ``Pool_layer:166``; the
    reference subsamples a random permutation — we take a fixed stride for
    determinism under jit)."""

    pooling_rate: int = 4
    neighbor_num: int = 4

    @nn.compact
    def __call__(self, points: Array, features: Array
                 ) -> Tuple[Array, Array]:
        idx = knn_indices(points, self.neighbor_num)
        nbr_f = jax.vmap(lambda f, i: f[i])(features, idx)
        pooled = jnp.max(nbr_f, axis=2)                   # neighbor max
        n = points.shape[1]
        keep = n // self.pooling_rate
        sel = jnp.arange(keep) * self.pooling_rate
        return points[:, sel], pooled[:, sel]


class GCN3DEncoder(nn.Module):
    """Multi-scale 3D-GCN encoder (ref ``gc3d_encoder.py:GCN3D_ENCODER:10``):
    surface conv + four direction-kernel convs across three resolutions,
    BatchNorm after convs 1-3, global = max over the coarsest features,
    per-point = nearest-neighbor upsampled 5-scale concat through a
    1024 -> 512 -> 256 BN MLP (ref ``:32-39,70-80``)."""

    global_dim: int = 256      # == conv_4 width; a Dense maps if different
    per_point_dim: int = 256
    support_num: int = 7
    neighbor_num: int = 10

    @nn.compact
    def __call__(self, points: Array, train: bool = True
                 ) -> Tuple[Array, Array]:
        bn = functools.partial(nn.BatchNorm,
                               use_running_average=not train,
                               momentum=0.9, epsilon=1e-5)
        n = points.shape[1]
        k = min(self.neighbor_num, n - 1)
        idx = knn_indices(points, k)
        fm0 = nn.relu(ConvSurface(128, self.support_num)(points, idx))
        fm1 = nn.relu(bn()(ConvLayer(128, self.support_num)(
            points, fm0, idx)))
        p1, fp1 = PoolLayer(4, min(4, n - 1))(points, fm1)

        # ref :60-61 shrinks k at pooled scales: min(k, N//8)
        k1 = max(1, min(self.neighbor_num, p1.shape[1] // 8))
        idx1 = knn_indices(p1, k1)
        fm2 = nn.relu(bn()(ConvLayer(256, self.support_num)(p1, fp1, idx1)))
        fm3 = nn.relu(bn()(ConvLayer(256, self.support_num)(p1, fm2, idx1)))
        p2, fp2 = PoolLayer(4, min(4, p1.shape[1] - 1))(p1, fm3)

        k2 = max(1, min(self.neighbor_num, p2.shape[1] // 8))
        idx2 = knn_indices(p2, k2)
        fm4 = ConvLayer(256, self.support_num)(p2, fp2, idx2)  # no BN/relu
        g = jnp.max(fm4, axis=1)                          # [B, 256]
        if self.global_dim != 256:
            g = nn.Dense(self.global_dim)(g)

        # nearest-neighbor upsample of the coarse scales (ref :72-76)
        def upsample(feat, coarse_pts):
            d = jnp.sum((points[:, :, None] - coarse_pts[:, None]) ** 2, -1)
            nearest = jnp.argmin(d, axis=-1)
            return jax.vmap(lambda f, i: f[i])(feat, nearest)

        fused = jnp.concatenate(
            [fm0, fm1, upsample(fm2, p1), upsample(fm3, p1),
             upsample(fm4, p2)], axis=-1)                 # [B, N, 1024]
        pp = nn.relu(bn()(nn.Dense(512)(fused)))
        pp = nn.relu(bn()(nn.Dense(256)(pp)))
        if self.per_point_dim != 256:
            pp = nn.Dense(self.per_point_dim)(pp)
        return g, pp
