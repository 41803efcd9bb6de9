"""3D-GCN surface-kernel encoder (FS-Net style).

Capability port of reference ``network/P_3DGC.py`` + ``network/gc3d_encoder.py``:
direction-kernel convolutions over kNN graphs — each kernel is a set of
learnable unit "support directions" with per-direction feature vectors;
a neighbor contributes through the cosine similarity between its offset
direction and each support (``Conv_surface:72`` / ``Conv_layer:115``),
pooling takes neighborhood maxima, and the encoder fuses multiple scales
into global + per-point codes (``gc3d_encoder.py:41-80``).

Everything is einsum over [B, N, k, ...] tensors: the similarity tensor and
feature mixing ride the MXU; no python loops.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.ops.knn import knn_points

Array = jax.Array

EPS = 1e-8


def knn_indices(points: Array, k: int) -> Array:
    """k nearest neighbors excluding self: [B, N, k]."""
    idx = knn_points(points, points, k + 1).idx
    return idx[..., 1:]


def neighbor_directions(points: Array, idx: Array) -> Array:
    """Unit offset directions to each neighbor: [B, N, k, 3]."""
    nbr = jax.vmap(lambda p, i: p[i])(points, idx)
    off = nbr - points[:, :, None, :]
    return off / (jnp.linalg.norm(off, axis=-1, keepdims=True) + EPS)


class ConvSurface(nn.Module):
    """First-layer surface convolution: geometry only (ref
    ``Conv_surface:72``).  Output [B, N, C]."""

    kernel_num: int
    support_num: int

    @nn.compact
    def __call__(self, points: Array, idx: Array) -> Array:
        directions = self.param(
            "directions", nn.initializers.uniform(scale=2.0),
            (self.support_num, 3))
        weights = self.param(
            "weights", nn.initializers.lecun_normal(),
            (self.support_num, self.kernel_num))
        d = directions / (jnp.linalg.norm(directions, axis=-1,
                                          keepdims=True) + EPS)
        nbr_dir = neighbor_directions(points, idx)        # [B, N, k, 3]
        sim = jnp.einsum("bnkv,sv->bnks", nbr_dir, d)     # cosine support
        sim = nn.relu(sim)
        feat = jnp.einsum("bnks,sc->bnkc", sim, weights)
        return jnp.max(feat, axis=2)                      # max over k


class ConvLayer(nn.Module):
    """General 3D-GC layer mixing center features with direction-gated
    neighbor features (ref ``Conv_layer:115``)."""

    out_channels: int
    support_num: int

    @nn.compact
    def __call__(self, points: Array, features: Array, idx: Array) -> Array:
        in_ch = features.shape[-1]
        center_w = self.param("center_kernel",
                              nn.initializers.lecun_normal(),
                              (in_ch, self.out_channels))
        support_w = self.param(
            "support_kernel", nn.initializers.lecun_normal(),
            (in_ch, self.support_num * self.out_channels))
        directions = self.param(
            "directions", nn.initializers.uniform(scale=2.0),
            (self.support_num, 3))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,))

        d = directions / (jnp.linalg.norm(directions, axis=-1,
                                          keepdims=True) + EPS)
        center = features @ center_w                      # [B, N, C_out]

        nbr_f = jax.vmap(lambda f, i: f[i])(features, idx)  # [B, N, k, Cin]
        sup = (nbr_f @ support_w).reshape(
            *nbr_f.shape[:3], self.support_num, self.out_channels)
        nbr_dir = neighbor_directions(points, idx)
        sim = nn.relu(jnp.einsum("bnkv,sv->bnks", nbr_dir, d))
        gated = jnp.einsum("bnks,bnksc->bnkc", sim, sup)
        agg = jnp.max(gated, axis=2)                      # max over k
        return center + agg + bias


class PoolLayer(nn.Module):
    """Neighborhood max-pool + uniform subsampling (ref ``Pool_layer:166``;
    the reference subsamples randomly — we take a fixed stride for
    determinism under jit)."""

    pooling_rate: int = 4
    neighbor_num: int = 4

    @nn.compact
    def __call__(self, points: Array, features: Array
                 ) -> Tuple[Array, Array]:
        idx = knn_indices(points, self.neighbor_num)
        nbr_f = jax.vmap(lambda f, i: f[i])(features, idx)
        pooled = jnp.maximum(features,
                             jnp.max(nbr_f, axis=2))      # local max
        n = points.shape[1]
        keep = n // self.pooling_rate
        sel = jnp.arange(keep) * self.pooling_rate
        return points[:, sel], pooled[:, sel]


class GCN3DEncoder(nn.Module):
    """Multi-scale 3D-GCN encoder (ref ``gc3d_encoder.py:GCN3D_ENCODER:10``):
    4 conv scales with pooling, fused into (global [B, G], per-point
    [B, N, P]) codes."""

    global_dim: int = 256
    per_point_dim: int = 256
    support_num: int = 7
    neighbor_num: int = 10

    @nn.compact
    def __call__(self, points: Array, train: bool = True
                 ) -> Tuple[Array, Array]:
        n = points.shape[1]
        k = min(self.neighbor_num, n - 1)
        idx = knn_indices(points, k)
        f1 = nn.relu(ConvSurface(128, self.support_num)(points, idx))
        f2 = nn.relu(ConvLayer(128, self.support_num)(points, f1, idx))
        p2, f2p = PoolLayer(4, min(4, n - 1))(points, f2)

        k2 = min(self.neighbor_num, p2.shape[1] - 1)
        idx2 = knn_indices(p2, k2)
        f3 = nn.relu(ConvLayer(256, self.support_num)(p2, f2p, idx2))
        f4 = nn.relu(ConvLayer(256, self.support_num)(p2, f3, idx2))
        p4, f4p = PoolLayer(4, min(4, p2.shape[1] - 1))(p2, f4)

        g = jnp.max(f4p, axis=1)                          # [B, 256]
        g = nn.Dense(self.global_dim)(g)

        # upsample coarse features back to every point by nearest neighbor
        d = jnp.sum((points[:, :, None] - p4[:, None]) ** 2, -1)
        nearest = jnp.argmin(d, axis=-1)
        f4_up = jax.vmap(lambda f, i: f[i])(f4p, nearest)  # [B, N, 256]
        pp = jnp.concatenate([f1, f2, f4_up], axis=-1)
        pp = nn.Dense(self.per_point_dim)(pp)
        return g, pp
