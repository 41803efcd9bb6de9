"""Point-cloud completion models (the vendored DCD benchmark's model zoo).

Capability ports of reference ``Density_aware_Chamfer_Distance/models/``:

  * ``PCN``      <- ``models/pcn.py`` (127 LoC): PointNet-ish encoder,
    coarse fully-connected decoder + folding refinement.
  * ``VRCNet``   <- ``models/vrcnet.py`` (540 LoC): self-attention /
    selective-kernel point blocks with a coarse-to-fine relational decoder
    (represented here by the SA/SK modules + a two-stage refinement head).
  * ``PointDiscriminator`` <- ``models/vrcnet_plus.py:Point_Discriminator:
    617`` for the GAN training path.

All channels-last, fixed shapes, MXU-friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


Array = jax.Array


class PCNEncoder(nn.Module):
    """Two-stage PointNet encoder with global-feature reinjection."""

    latent_dim: int = 1024

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(nn.Dense(128)(x))
        h = nn.Dense(256)(h)
        g = jnp.max(h, axis=1, keepdims=True)
        # Dense over concat(h, broadcast(g)) expressed as a sum of two Dense
        # paths — equivalent math, but avoids a broadcast+concat fusion that
        # crashes the TPU backend compiler (fusion_util TransformWindow
        # check) on [B, N, C] shapes.
        h = nn.relu(nn.Dense(512, name="local")(h) +
                    nn.Dense(512, name="global")(g))
        h = nn.Dense(self.latent_dim)(h)
        return jnp.max(h, axis=1)


class PCN(nn.Module):
    """PCN completion: coarse FC decoder + folding refinement."""

    num_coarse: int = 512
    grid_size: int = 2   # each coarse point unfolds to grid_size^2 points
    latent_dim: int = 1024

    @nn.compact
    def __call__(self, partial: Array, train: bool = True
                 ) -> Tuple[Array, Array]:
        b = partial.shape[0]
        code = PCNEncoder(self.latent_dim)(partial)

        h = nn.relu(nn.Dense(1024)(code))
        h = nn.relu(nn.Dense(1024)(h))
        coarse = nn.Dense(self.num_coarse * 3)(h).reshape(
            b, self.num_coarse, 3)

        g2 = self.grid_size ** 2
        n_fine = self.num_coarse * g2
        lin = jnp.linspace(-0.05, 0.05, self.grid_size)
        grid = jnp.stack(jnp.meshgrid(lin, lin, indexing="ij"),
                         -1).reshape(1, 1, g2, 2)
        grid = jnp.broadcast_to(grid, (b, self.num_coarse, g2, 2))
        center = jnp.repeat(coarse[:, :, None, :], g2, axis=2)
        code_exp = jnp.broadcast_to(
            code[:, None, None, :],
            (b, self.num_coarse, g2, self.latent_dim))
        feat = jnp.concatenate([grid, center, code_exp], axis=-1)
        feat = feat.reshape(b, n_fine, -1)
        h = nn.relu(nn.Dense(512)(feat))
        h = nn.relu(nn.Dense(512)(h))
        fine = nn.Dense(3)(h) + center.reshape(b, n_fine, 3)
        return coarse, fine


class SAModule(nn.Module):
    """Point self-attention block (ref ``vrcnet.py:SA_module:15``)."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        q = nn.Dense(self.channels // 4)(x)
        k = nn.Dense(self.channels // 4)(x)
        v = nn.Dense(self.channels)(x)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k,
                       preferred_element_type=jnp.float32)
            * (q.shape[-1] ** -0.5), axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        return nn.relu(x + nn.Dense(self.channels)(out))


class SKSAModule(nn.Module):
    """Selective-kernel fusion of two attention branches
    (ref ``vrcnet.py:SK_SA_module:102``)."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = SAModule(self.channels)(x)
        b2 = nn.relu(nn.Dense(self.channels)(x))
        u = jnp.mean(b1 + b2, axis=1)                 # [B, C]
        z = nn.relu(nn.Dense(self.channels // 4)(u))
        a = nn.Dense(2 * self.channels)(z).reshape(
            -1, 2, self.channels)
        w = jax.nn.softmax(a, axis=1)
        return w[:, None, 0] * b1 + w[:, None, 1] * b2


class LinearResBlock(nn.Module):
    """Residual linear block (ref ``vrcnet.py:Linear_ResBlock``)."""

    output_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(nn.Dense(x.shape[-1])(x))
        h = nn.Dense(self.output_size)(h)
        skip = nn.Dense(self.output_size)(x)
        return nn.relu(h + skip)


def _gather_neighbors(feat: Array, idx: Array) -> Array:
    """feat [B, N, C], idx [B, S, K] (into N) -> [B, S, K, C]."""
    b = feat.shape[0]
    return feat[jnp.arange(b)[:, None, None], idx]


class PointSA(nn.Module):
    """Relational self-attention over a kNN neighborhood with shared-plane
    position-adaptive weights (ref ``vrcnet.py:SA_module:15-52``): the
    learned weight map ``w`` [K, mid/share] is tiled across ``share_planes``
    channel groups and contracts the neighbor values."""

    rel: int
    mid: int
    out: int
    share: int = 8

    @nn.compact
    def __call__(self, x: Array, idx: Array) -> Array:
        b, n, _ = x.shape
        k = idx.shape[-1]
        share = min(self.share, self.mid)
        identity = x
        h = nn.relu(x)
        xn = _gather_neighbors(h, idx)                     # [B, N, K, C]
        x1 = nn.Dense(self.rel, name="conv1")(h)           # [B, N, rel]
        x2 = nn.Dense(self.rel, name="conv2")(xn)          # [B, N, K, rel]
        x3 = nn.Dense(self.mid, name="conv3")(xn)          # [B, N, K, mid]

        w = jnp.concatenate([x1, x2.reshape(b, n, k * self.rel)], axis=-1)
        w = nn.Dense(self.mid // share, use_bias=False,
                     name="conv_w1")(nn.relu(w))
        w = nn.Dense(k * (self.mid // share), name="conv_w2")(nn.relu(w))
        w = w.reshape(b, n, k, self.mid // share)
        w = jnp.tile(w, (1, 1, 1, share))                  # [B, N, K, mid]

        out = jnp.sum(w * x3, axis=2)                      # [B, N, mid]
        out = nn.Dense(self.out, name="conv_out")(nn.relu(out))
        return out + identity


class SKSAKnn(nn.Module):
    """Selective-kernel fusion of PointSA branches at different kNN sizes
    (ref ``vrcnet.py:SK_SA_module:102-150``)."""

    channels: int
    r: int = 2
    L: int = 32

    @nn.compact
    def __call__(self, x: Array, idx_list) -> Array:
        c = self.channels
        feas = [nn.relu(PointSA(max(1, c // 16), max(2, c // 4), c,
                                name=f"sam{i}")(x, idx))
                for i, idx in enumerate(idx_list)]
        fea_u = sum(feas)
        fea_s = jnp.mean(fea_u, axis=1)                    # [B, C]
        d = max(c // self.r, self.L)
        fea_z = nn.Dense(d, name="fc")(fea_s)
        vecs = jnp.stack([nn.Dense(c, name=f"fcs{i}")(fea_z)
                          for i in range(len(idx_list))], axis=1)
        attn = jax.nn.softmax(vecs, axis=1)                # [B, nk, C]
        stacked = jnp.stack(feas, axis=1)                  # [B, nk, N, C]
        return jnp.sum(attn[:, :, None, :] * stacked, axis=1)


class SKNResUnit(nn.Module):
    """conv -> SK-SA blocks -> conv, residual (ref ``SKN_Res_unit:152``)."""

    channels: int
    blocks: int = 1

    @nn.compact
    def __call__(self, x: Array, idx_list) -> Array:
        h = nn.Dense(self.channels, use_bias=False, name="conv1")(x)
        for j in range(self.blocks):
            h = SKSAKnn(self.channels, name=f"sam{j}")(h, idx_list)
        h = nn.Dense(self.channels, use_bias=False, name="conv2")(nn.relu(h))
        return h + nn.Dense(self.channels, use_bias=False,
                            name="conv_res")(x)


def edge_preserve_sampling(feat: Array, pts: Array, num_samples: int,
                           k: int):
    """FPS downsample keeping edge detail: concat(center feature, max over
    the kNN neighborhood's features) (ref ``utils/model_utils.py:
    edge_preserve_sampling:200-223``).  Doubles the channel count."""
    from ured_tpu.ops.knn import knn_points
    from ured_tpu.ops.sampling import farthest_point_sample, gather_points

    p_idx = farthest_point_sample(pts, num_samples)        # [B, S]
    new_pts = gather_points(pts, p_idx)                    # [B, S, 3]
    pk = min(k, pts.shape[1])
    nn_idx = knn_points(new_pts, pts, pk).idx              # [B, S, pk]
    neighbor = jnp.max(_gather_neighbors(feat, nn_idx), axis=2)
    center = jnp.take_along_axis(feat, p_idx[..., None], axis=1)
    return jnp.concatenate([center, neighbor], axis=-1), new_pts


def edge_unpool(feat: Array, src_pts: Array, tgt_pts: Array) -> Array:
    """Inverse-distance 3-NN feature upsampling (ref ``three_nn_upsampling:
    397`` + ``pn2.three_interpolate``)."""
    from ured_tpu.ops.sampling import (
        interpolation_weights,
        three_interpolate,
        three_nn,
    )

    dist, idx = three_nn(tgt_pts, src_pts)
    return three_interpolate(feat, idx, interpolation_weights(dist))


class SASKNResEncoder(nn.Module):
    """4-level kNN U-Net over a point set: SKN-Res units + edge-preserving
    downsampling on the way down, a dropout-regularized global bottleneck,
    and 3-NN interpolated skip connections on the way up
    (ref ``vrcnet.py:SA_SKN_Res_encoder:173-291``)."""

    output_size: int = 256
    init_channel: int = 64
    bottleneck: int = 1024
    knn_list: Tuple[int, ...] = (10, 20)
    pk: int = 10
    layers: Tuple[int, ...] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, features: Array, train: bool = True) -> Array:
        from ured_tpu.ops.knn import knn_graph

        pts = features[..., :3]
        c1 = self.init_channel
        chans = (c1, c1 * 2, c1 * 4, c1 * 8)

        x = features
        skips, levels = [], []
        for lvl in range(4):
            n = pts.shape[1]
            idx_list = [knn_graph(pts, min(k, n)) for k in self.knn_list]
            x = nn.relu(SKNResUnit(chans[lvl], self.layers[lvl],
                                   name=f"sam_res{lvl + 1}")(x, idx_list))
            skips.append(x)
            levels.append(pts)
            if lvl < 3:
                x, pts = edge_preserve_sampling(x, pts, n // 2, self.pk)

        g = nn.Dense(self.bottleneck, name="conv5")(x)
        g = jnp.max(g, axis=1)                             # [B, bottleneck]
        drop = nn.Dropout(0.5, deterministic=not train)
        g = nn.relu(nn.Dense(self.bottleneck // 2, name="fc1")(g))
        g = drop(nn.relu(nn.Dense(self.bottleneck, name="fc2")(drop(g))))

        x = jnp.broadcast_to(g[:, None, :],
                             (x.shape[0], x.shape[1], self.bottleneck))
        for lvl in range(3, -1, -1):
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = nn.relu(nn.Dense(chans[lvl], name=f"conv{6 + 3 - lvl}")(x))
            if lvl > 0:
                x = edge_unpool(x, levels[lvl], levels[lvl - 1])
        return nn.Dense(self.output_size, name="conv_out")(x)


class EFExpansion(nn.Module):
    """Edge-aware feature expansion: kNN edge features -> conv to
    ``step_ratio`` channel blocks -> reshape into step_ratio x points ->
    max over neighbors (ref ``utils/model_utils.py:EF_expansion:137-168``).
    [B, N, C] -> [B, N * step_ratio, output_size]."""

    output_size: int = 64
    step_ratio: int = 2
    k: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ured_tpu.ops.knn import knn_graph

        b, n, c = x.shape
        k = min(self.k, n)
        idx = knn_graph(x, k)                              # feature-space kNN
        xn = _gather_neighbors(x, idx)                     # [B, N, K, C]
        center = jnp.broadcast_to(x[:, :, None, :], xn.shape)
        edge = jnp.concatenate([center, xn], axis=-1)      # [B, N, K, 2C]

        e1 = nn.Dense(self.output_size, name="conv1")(edge)
        e = nn.relu(jnp.concatenate([e1, edge], axis=-1))
        e = nn.relu(nn.Dense(self.output_size * self.step_ratio,
                             name="conv2")(e))             # [B, N, K, C*r]
        e = e.transpose(0, 2, 1, 3).reshape(
            b, k, n * self.step_ratio, self.output_size)
        e = nn.Dense(self.output_size, name="conv3")(e)
        return jnp.max(e, axis=1)                          # [B, N*r, out]


class FoldingExpansion(nn.Module):
    """Local folding upsampler: repeat each point ``step_ratio`` times,
    concatenate a 2D grid + the global feature, one conv
    (ref ``vrcnet.py:Folding:54-88``)."""

    output_size: int
    step_ratio: int

    @nn.compact
    def __call__(self, point_feat: Array, global_feat: Array) -> Array:
        b, n, c = point_feat.shape
        r = self.step_ratio
        num_x = 1
        for i in range(int(np.sqrt(r)) + 1, 0, -1):
            if r % i == 0:
                num_x = i
                break
        num_y = r // num_x
        gx = jnp.linspace(-0.2, 0.2, num_x)
        gy = jnp.linspace(-0.2, 0.2, num_y)
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="ij"),
                         -1).reshape(r, 2)
        grid = jnp.tile(grid, (n, 1))[None].repeat(b, axis=0)  # [B, N*r, 2]

        pf = jnp.repeat(point_feat, r, axis=1)             # [B, N*r, C]
        gf = jnp.broadcast_to(global_feat[:, None, :],
                              (b, n * r, global_feat.shape[-1]))
        feat = jnp.concatenate([gf, pf, grid], axis=-1)
        return nn.relu(nn.Dense(self.output_size, name="conv")(feat))


class MSAPSKNDecoder(nn.Module):
    """Multi-stage auto-regressive-point / selective-kernel decoder
    (ref ``vrcnet.py:MSAP_SKN_decoder:293-402``):

      1. FC skeleton ``coarse_raw`` from the global feature,
      2. relational SK-SA U-Net over coarse_raw + the partial input,
      3. optional edge-aware expansion when more points are needed,
      4. per-point displacement head -> ``coarse_high``,
      5. **guided downsampling**: FPS then a learned score top-k selection
         -> ``coarse``,
      6. local-folding (or EF-expansion) upsampling -> ``fine``.

    Returns a dict {coarse_raw, coarse_high, coarse, fine}.
    """

    num_coarse_raw: int = 1024
    num_fps: int = 1024
    num_coarse: int = 512
    num_fine: int = 2048
    dense_feature_size: int = 256
    expand_feature_size: int = 64
    init_channel: int = 64
    bottleneck: int = 1024
    knn_list: Tuple[int, ...] = (10, 20)
    pk: int = 10
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    points_label: bool = True
    local_folding: bool = True

    @nn.compact
    def __call__(self, global_feat: Array, point_input: Array,
                 train: bool = True):
        b = global_feat.shape[0]
        ni = point_input.shape[1]

        h = nn.relu(nn.Dense(1024, name="fc1")(global_feat))
        h = nn.relu(nn.Dense(1024, name="fc2")(h))
        coarse_raw = nn.Dense(self.num_coarse_raw * 3, name="fc3")(h)
        coarse_raw = coarse_raw.reshape(b, self.num_coarse_raw, 3)

        if self.points_label:
            # label channel 0 = generated skeleton, 1 = observed input
            coarse_in = jnp.concatenate(
                [coarse_raw, jnp.zeros((b, self.num_coarse_raw, 1))], -1)
            points_in = jnp.concatenate(
                [point_input, jnp.ones((b, ni, 1))], -1)
        else:
            coarse_in, points_in = coarse_raw, point_input
        points = jnp.concatenate([coarse_in, points_in], axis=1)
        m0 = points.shape[1]
        if m0 % 8:
            raise ValueError(
                f"num_coarse_raw + num_input = {m0} must be divisible by 8 "
                "(4-level edge-preserving downsampling)")

        dense_feat = SASKNResEncoder(
            self.dense_feature_size, self.init_channel, self.bottleneck,
            self.knn_list, self.pk, self.layers,
            name="encoder")(points, train=train)

        up_scale = -(-self.num_fine // m0)  # ceil
        if up_scale >= 2:
            dense_feat = EFExpansion(self.expand_feature_size, up_scale,
                                     k=4, name="expansion1")(dense_feat)
        coarse_features = nn.relu(
            nn.Dense(self.expand_feature_size, name="conv_cup1")(dense_feat))
        coarse_high = nn.Dense(3, name="conv_cup2")(coarse_features)

        m = coarse_high.shape[1]
        if m > self.num_fps:
            from ured_tpu.ops.sampling import (
                farthest_point_sample,
                gather_points,
            )

            idx_fps = farthest_point_sample(coarse_high, self.num_fps)
            coarse_fps = gather_points(coarse_high, idx_fps)
            coarse_features = jnp.take_along_axis(
                coarse_features, idx_fps[..., None], axis=1)
        else:
            coarse_fps = coarse_high

        if coarse_fps.shape[1] > self.num_coarse:
            # guided downsampling: learned per-point keep scores, top-k
            s = nn.relu(nn.Dense(16, name="conv_s1")(coarse_features))
            s = nn.relu(nn.Dense(8, name="conv_s2")(s))
            s = jax.nn.softplus(nn.Dense(1, name="conv_s3")(s))[..., 0]
            _, idx_s = jax.lax.top_k(s, self.num_coarse)   # [B, num_coarse]
            coarse = jnp.take_along_axis(coarse_fps, idx_s[..., None], 1)
            coarse_features = jnp.take_along_axis(
                coarse_features, idx_s[..., None], axis=1)
        else:
            coarse = coarse_fps

        nc = coarse.shape[1]
        if nc < self.num_fine:
            if self.num_fine % nc:
                raise ValueError(
                    f"num_fine={self.num_fine} must be a multiple of "
                    f"num_coarse={nc}")
            r = self.num_fine // nc
            if self.local_folding:
                up = FoldingExpansion(self.dense_feature_size, r,
                                      name="expansion2")(coarse_features,
                                                         global_feat)
                center = jnp.repeat(coarse, r, axis=1)
                f = nn.relu(nn.Dense(self.expand_feature_size,
                                     name="conv_f1")(up))
                fine = nn.Dense(3, name="conv_f2")(f) + center
            else:
                up = EFExpansion(self.dense_feature_size, r, k=4,
                                 name="expansion2")(coarse_features)
                f = nn.relu(nn.Dense(self.expand_feature_size,
                                     name="conv_f1")(up))
                fine = nn.Dense(3, name="conv_f2")(f)
        else:
            fine = coarse

        return {"coarse_raw": coarse_raw, "coarse_high": coarse_high,
                "coarse": coarse, "fine": fine}


class VRCNet(nn.Module):
    """Variational-relational completion net (port of ``vrcnet.py:Model:
    406-540``): a PCN-style encoder feeds the **dual-path probabilistic
    module** — the partial cloud infers the posterior q(z|x) while an
    FPS-downsampled view of the complete cloud infers the prior p(z|y)
    (``posterior_infer1/2`` / ``prior_infer`` / ``generator``, ref
    ``:419-422``); generation decodes through the MSAP_SKN
    folding/guided-downsampling decoder.

    Training with ``gt`` decodes BOTH latent paths on a doubled batch
    (ref ``:461-466``: ``z = cat(z_q, z_p)``) and returns
    ``kl = KL(N(0,1) || p) + KL(stop_grad(p) || q)`` (the KLD variant of
    ``dl_rec`` / ``dl_g``, ref ``:495-500``).  Inference uses the
    posterior mean from the partial cloud alone.

    Returns ``(outs, kl)`` with outs = {coarse_raw, coarse_high, coarse,
    fine}; at train time each output has leading batch 2B (q-path first).
    """

    num_fine: int = 2048
    num_coarse: int = 512
    num_fps: int = 1024
    num_coarse_raw: int = 1024
    latent_dim: int = 1024
    size_z: int = 128
    init_channel: int = 64
    bottleneck: int = 1024
    knn_list: Tuple[int, ...] = (10, 20)
    pk: int = 10
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    points_label: bool = True
    local_folding: bool = True

    @nn.compact
    def __call__(self, partial: Array, gt: Optional[Array] = None,
                 train: bool = True):
        from ured_tpu.ops.sampling import (
            farthest_point_sample,
            gather_points,
        )

        ni = partial.shape[1]
        encoder = PCNEncoder(self.latent_dim, name="encoder")
        feat_x = encoder(partial)

        post = LinearResBlock(self.latent_dim,
                              name="posterior_infer1")(feat_x)
        post = LinearResBlock(2 * self.size_z,
                              name="posterior_infer2")(post)
        q_mu, q_std = jnp.split(post, 2, axis=-1)
        q_std = jax.nn.softplus(q_std) + 1e-6

        kl = jnp.zeros((), jnp.float32)
        decoder = MSAPSKNDecoder(
            self.num_coarse_raw, self.num_fps, self.num_coarse,
            self.num_fine, init_channel=self.init_channel,
            bottleneck=self.bottleneck, knn_list=self.knn_list, pk=self.pk,
            layers=self.layers, points_label=self.points_label,
            local_folding=self.local_folding, name="decoder")

        if gt is not None and train:
            # prior path sees an FPS view of the complete shape at the
            # partial cloud's resolution (ref :447-449)
            y = gather_points(gt, farthest_point_sample(gt, ni))
            feat_y = encoder(y)
            prior = LinearResBlock(2 * self.size_z,
                                   name="prior_infer")(feat_y)
            p_mu, p_std = jnp.split(prior, 2, axis=-1)
            p_std = jax.nn.softplus(p_std) + 1e-6

            def kld(mu1, std1, mu2, std2):
                return jnp.mean(jnp.sum(
                    jnp.log(std2 / std1)
                    + (std1 ** 2 + (mu1 - mu2) ** 2) / (2.0 * std2 ** 2)
                    - 0.5, axis=-1))

            # dl_rec = KL(N(0,1) || p); dl_g = KL(stop_grad(p) || q)
            kl = kld(jnp.zeros_like(p_mu), jnp.ones_like(p_std),
                     p_mu, p_std) + \
                kld(jax.lax.stop_gradient(p_mu),
                    jax.lax.stop_gradient(p_std), q_mu, q_std)

            rng = self.make_rng("sample") if self.has_rng("sample") \
                else jax.random.PRNGKey(0)
            kq, kp = jax.random.split(rng)
            z_q = q_mu + q_std * jax.random.normal(kq, q_mu.shape)
            z_p = p_mu + p_std * jax.random.normal(kp, p_mu.shape)
            z = jnp.concatenate([z_q, z_p], axis=0)
            feat = jnp.concatenate([feat_x, feat_x], axis=0)
            points = jnp.concatenate([partial, partial], axis=0)
        else:
            z = q_mu  # deterministic inference (ref samples; mean is stabler)
            feat = feat_x
            points = partial

        code = feat + LinearResBlock(self.latent_dim, name="generator")(z)
        outs = decoder(code, points, train=train)
        return outs, kl


class PointDiscriminator(nn.Module):
    """Point-cloud discriminator for adversarial completion training
    (ref ``vrcnet_plus.py:Point_Discriminator:617``)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        h = nn.relu(nn.Dense(64)(x))
        h = nn.relu(nn.Dense(128)(h))
        h = nn.Dense(256)(h)
        g = jnp.max(h, axis=1)
        g = nn.relu(nn.Dense(128)(g))
        return nn.Dense(1)(g)
