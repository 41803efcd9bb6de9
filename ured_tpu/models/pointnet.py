"""PointNet and PointNet++ model zoo.

Capability port of reference ``network/pointnet/`` (11 files: PointNet
cls / part-seg / sem-seg plus PointNet++ SSG / MSG variants over the CUDA
sampling ops).  Built on the TPU-native ops in ``ured_tpu.ops.sampling``;
layout channels-last, all fixed shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.models.encoder import STN3D
from ured_tpu.models.ffn import ConvBNRelu
from ured_tpu.ops.sampling import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_points,
    interpolation_weights,
    three_interpolate,
    three_nn,
)

Array = jax.Array


class PointNetFeat(nn.Module):
    """Shared PointNet trunk with input/feature STNs (reference
    ``pointnet_utils.py``: STN3d + feature transform)."""

    global_feat: bool = True
    feature_transform: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        b, n, _ = x.shape
        trans = STN3D(3)(x, train=train)
        x = jnp.einsum("bij,bnj->bni", trans, x)
        x = ConvBNRelu(64)(x, train=train)
        trans_feat = None
        if self.feature_transform:
            trans_feat = STN3D(64)(x, train=train)
            x = jnp.einsum("bij,bnj->bni", trans_feat, x)
        point_feat = x
        x = ConvBNRelu(128)(x, train=train)
        x = ConvBNRelu(1024)(x, train=train)
        g = jnp.max(x, axis=1)
        if self.global_feat:
            return g, trans, trans_feat
        g_exp = jnp.broadcast_to(g[:, None], (b, n, 1024))
        return jnp.concatenate([point_feat, g_exp], -1), trans, trans_feat


def feature_transform_regularizer(trans: Array) -> Array:
    """||I - A A^T||^2 (reference ``pointnet_utils.py``)."""
    d = trans.shape[-1]
    eye = jnp.eye(d)
    diff = eye[None] - jnp.einsum("bij,bkj->bik", trans, trans)
    return jnp.mean(jnp.sum(diff * diff, axis=(1, 2)))


class PointNetCls(nn.Module):
    """PointNet classifier (reference ``pointnet_cls.py``)."""

    num_classes: int = 40
    feature_transform: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        g, trans, trans_feat = PointNetFeat(
            True, self.feature_transform)(x, train=train)
        h = nn.Dense(512)(g)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Dense(256)(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        logits = nn.Dense(self.num_classes)(h)
        return jax.nn.log_softmax(logits, -1), trans_feat


class PointNetSeg(nn.Module):
    """Per-point segmentation head (reference ``pointnet_part_seg.py`` /
    ``pointnet_sem_seg.py`` shape)."""

    num_classes: int = 50

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        feat, _, trans_feat = PointNetFeat(False, True)(x, train=train)
        h = ConvBNRelu(512)(feat, train=train)
        h = ConvBNRelu(256)(h, train=train)
        h = ConvBNRelu(128)(h, train=train)
        logits = nn.Dense(self.num_classes)(h)
        return jax.nn.log_softmax(logits, -1), trans_feat


class SetAbstraction(nn.Module):
    """PointNet++ SA layer, single scale (reference
    ``pointnet2_utils.py:PointNetSetAbstraction``)."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz: Array, features: Optional[Array],
                 train: bool = True) -> Tuple[Array, Array]:
        if self.group_all:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped = xyz[:, None]                        # [B, 1, N, 3]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, features[:, None]], axis=-1)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, fps_idx)
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped = group_points(xyz, idx) - new_xyz[:, :, None]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, group_points(features, idx)], axis=-1)
        h = grouped
        for ch in self.mlp:
            h = nn.Dense(ch)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
        new_features = jnp.max(h, axis=2)                 # pool over K
        return new_xyz, new_features


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA layer (reference MSG variants)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz: Array, features: Optional[Array],
                 train: bool = True) -> Tuple[Array, Array]:
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, fps_idx)
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples,
                                        self.mlps):
            idx = ball_query(radius, nsample, xyz, new_xyz)
            grouped = group_points(xyz, idx) - new_xyz[:, :, None]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, group_points(features, idx)], axis=-1)
            h = grouped
            for ch in mlp:
                h = nn.Dense(ch)(h)
                h = nn.BatchNorm(use_running_average=not train)(h)
                h = nn.relu(h)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """PointNet++ FP layer (reference three_nn/three_interpolate path)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1: Array, xyz2: Array,
                 feat1: Optional[Array], feat2: Array,
                 train: bool = True) -> Array:
        if xyz2.shape[1] == 1:
            interp = jnp.broadcast_to(
                feat2, (xyz1.shape[0], xyz1.shape[1], feat2.shape[-1]))
        else:
            dists, idx = three_nn(xyz1, xyz2)
            w = interpolation_weights(dists)
            interp = three_interpolate(feat2, idx, w)
        if feat1 is not None:
            interp = jnp.concatenate([interp, feat1], axis=-1)
        h = interp
        for ch in self.mlp:
            h = nn.Dense(ch)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
        return h


class PointNet2ClsSSG(nn.Module):
    """PointNet++ classification, single-scale grouping."""

    num_classes: int = 40

    @nn.compact
    def __call__(self, xyz: Array, train: bool = True) -> Array:
        l1_xyz, l1_f = SetAbstraction(512, 0.2, 32, (64, 64, 128))(
            xyz, None, train=train)
        l2_xyz, l2_f = SetAbstraction(128, 0.4, 64, (128, 128, 256))(
            l1_xyz, l1_f, train=train)
        _, l3_f = SetAbstraction(None, None, None, (256, 512, 1024),
                                 group_all=True)(l2_xyz, l2_f, train=train)
        g = l3_f[:, 0]
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(
            nn.Dense(512)(g)))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(
            nn.Dense(256)(h)))
        return jax.nn.log_softmax(nn.Dense(self.num_classes)(h), -1)


class PointNet2ClsMSG(nn.Module):
    """PointNet++ classification, multi-scale grouping."""

    num_classes: int = 40

    @nn.compact
    def __call__(self, xyz: Array, train: bool = True) -> Array:
        l1_xyz, l1_f = SetAbstractionMSG(
            256, (0.1, 0.2, 0.4), (16, 32, 64),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)))(
                xyz, None, train=train)
        l2_xyz, l2_f = SetAbstractionMSG(
            64, (0.2, 0.4, 0.8), (32, 64, 64),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)))(
                l1_xyz, l1_f, train=train)
        _, l3_f = SetAbstraction(None, None, None, (256, 512, 1024),
                                 group_all=True)(l2_xyz, l2_f, train=train)
        g = l3_f[:, 0]
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(
            nn.Dense(512)(g)))
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(
            nn.Dense(256)(h)))
        return jax.nn.log_softmax(nn.Dense(self.num_classes)(h), -1)


class PointNet2SegSSG(nn.Module):
    """PointNet++ semantic segmentation, SSG."""

    num_classes: int = 13

    @nn.compact
    def __call__(self, xyz: Array, train: bool = True) -> Array:
        l1_xyz, l1_f = SetAbstraction(256, 0.2, 32, (64, 64, 128))(
            xyz, None, train=train)
        l2_xyz, l2_f = SetAbstraction(64, 0.4, 64, (128, 128, 256))(
            l1_xyz, l1_f, train=train)
        l1_up = FeaturePropagation((256, 128))(
            l1_xyz, l2_xyz, l1_f, l2_f, train=train)
        l0_up = FeaturePropagation((128, 128))(
            xyz, l1_xyz, None, l1_up, train=train)
        logits = nn.Dense(self.num_classes)(l0_up)
        return jax.nn.log_softmax(logits, -1)


class PointNet2PartSeg(nn.Module):
    """PointNet++ part segmentation with shape-class conditioning
    (reference ``network/pointnet/pointnet2_part_seg_ssg.py`` /
    ``_msg.py``): the shape's one-hot class label is broadcast per point
    and concatenated with the coordinates before the final propagation.
    ``msg=True`` uses the multi-scale grouping trunk."""

    num_part_classes: int = 50
    num_shape_classes: int = 16
    msg: bool = False

    @nn.compact
    def __call__(self, xyz: Array, cls_label: Array,
                 train: bool = True) -> Array:
        """xyz: [B, N, 3]; cls_label: [B] int or [B, num_shape_classes]
        one-hot.  Returns [B, N, num_part_classes] log-probs."""
        b, n, _ = xyz.shape
        if cls_label.ndim == 1:
            cls_label = jax.nn.one_hot(cls_label, self.num_shape_classes)
        if self.msg:
            l1_xyz, l1_f = SetAbstractionMSG(
                256, (0.1, 0.2, 0.4), (16, 32, 64),
                ((32, 32, 64), (64, 64, 128), (64, 96, 128)))(
                    xyz, None, train=train)
            l2_xyz, l2_f = SetAbstractionMSG(
                64, (0.2, 0.4, 0.8), (32, 64, 64),
                ((64, 64, 128), (128, 128, 256), (128, 128, 256)))(
                    l1_xyz, l1_f, train=train)
        else:
            l1_xyz, l1_f = SetAbstraction(256, 0.2, 32, (64, 64, 128))(
                xyz, None, train=train)
            l2_xyz, l2_f = SetAbstraction(64, 0.4, 64, (128, 128, 256))(
                l1_xyz, l1_f, train=train)
        _, l3_f = SetAbstraction(None, None, None, (256, 512, 1024),
                                 group_all=True)(l2_xyz, l2_f, train=train)
        l2_up = FeaturePropagation((256, 256))(
            l2_xyz, l2_xyz[:, :1], l2_f,
            jnp.broadcast_to(l3_f, (b, 1, l3_f.shape[-1])), train=train)
        l1_up = FeaturePropagation((256, 128))(
            l1_xyz, l2_xyz, l1_f, l2_up, train=train)
        cls_per_point = jnp.broadcast_to(
            cls_label[:, None, :], (b, n, cls_label.shape[-1]))
        l0_in = jnp.concatenate([cls_per_point, xyz], axis=-1)
        l0_up = FeaturePropagation((128, 128, 128))(
            xyz, l1_xyz, l0_in, l1_up, train=train)
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(
            nn.Dense(128)(l0_up)))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        logits = nn.Dense(self.num_part_classes)(h)
        return jax.nn.log_softmax(logits, -1)
