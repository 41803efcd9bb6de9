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


class VRCNet(nn.Module):
    """Variational-relational completion net (port of ``vrcnet.py:Model:
    406``): a PCN-style encoder feeds a **dual-path probabilistic module**
    — the complete cloud's posterior q(z|gt) trains against the partial
    cloud's prior p(z|partial) through a KL term (``posterior_infer`` /
    ``prior_infer`` / ``generator``, ref ``:419-422``) — and an SK-SA
    relational refinement produces the dense output.

    Call with ``gt`` during training to get (coarse, fine, kl); without it
    (inference) the prior path drives generation and kl is 0.
    """

    num_coarse: int = 256
    up_factor: int = 4
    latent_dim: int = 512
    size_z: int = 64

    @nn.compact
    def __call__(self, partial: Array, gt: Optional[Array] = None,
                 train: bool = True):
        b, n, _ = partial.shape
        h = nn.relu(nn.Dense(128, name="enc0")(partial))
        h = SKSAModule(128, name="sksa0")(h)
        h = nn.relu(nn.Dense(256, name="enc1")(h))
        h = SKSAModule(256, name="sksa1")(h)
        feat_partial = jnp.max(nn.Dense(self.latent_dim,
                                        name="enc_out")(h), axis=1)

        # prior from the partial observation
        prior = LinearResBlock(2 * self.size_z,
                               name="prior_infer")(feat_partial)
        p_mu, p_logvar = jnp.split(prior, 2, axis=-1)

        kl = jnp.zeros((), jnp.float32)
        if gt is not None and train:
            gt_h = nn.relu(nn.Dense(256, name="gt_enc0")(gt))
            feat_gt = jnp.max(nn.Dense(self.latent_dim,
                                       name="gt_enc1")(gt_h), axis=1)
            post = LinearResBlock(self.latent_dim,
                                  name="posterior_infer1")(feat_gt)
            post = LinearResBlock(2 * self.size_z,
                                  name="posterior_infer2")(post)
            q_mu, q_logvar = jnp.split(post, 2, axis=-1)
            # KL(q || p), diagonal Gaussians
            kl = 0.5 * jnp.mean(jnp.sum(
                p_logvar - q_logvar
                + (jnp.exp(q_logvar) + (q_mu - p_mu) ** 2)
                / jnp.exp(p_logvar) - 1.0, axis=-1))
            z_mu, z_logvar = q_mu, q_logvar
        else:
            z_mu, z_logvar = p_mu, p_logvar

        if train:
            eps = jax.random.normal(
                self.make_rng("sample") if self.has_rng("sample")
                else jax.random.PRNGKey(0), z_mu.shape)
            z = z_mu + jnp.exp(0.5 * z_logvar) * eps
        else:
            z = z_mu
        code = feat_partial + LinearResBlock(
            self.latent_dim, name="generator")(z)

        # coarse skeleton from the fused code
        g = nn.relu(nn.Dense(1024, name="dec0")(code))
        coarse = nn.Dense(self.num_coarse * 3, name="dec_coarse")(g).reshape(
            b, self.num_coarse, 3)

        # relational refinement: attention over coarse + code, offsets
        code_exp = jnp.broadcast_to(
            code[:, None, :], (b, self.num_coarse, self.latent_dim))
        f = jnp.concatenate([coarse, code_exp], axis=-1)
        f = nn.relu(nn.Dense(256, name="refine0")(f))
        f = SAModule(256, name="refine_sa")(f)
        up = nn.Dense(self.up_factor * 3, name="refine_up")(f).reshape(
            b, self.num_coarse * self.up_factor, 3)
        center = jnp.repeat(coarse, self.up_factor, axis=1)
        fine = center + 0.1 * jnp.tanh(up)
        return coarse, fine, kl


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
