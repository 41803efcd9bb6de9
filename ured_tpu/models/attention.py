"""Attention mechanisms for the graph decoder.

Ports of reference ``attention_graph/attention.py`` (softmax, linear/ELU
linear, FAVOR+ random-feature attention) in channels-last layout.  The graph
attention here runs over <=18 nodes (2 global + 16 parts,
``deformation_net.py:83-89``) so these are tiny einsums; FAVOR+ is kept for
capability parity.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def softmax_attention(q: Array, k: Array, v: Array,
                      key_mask: Optional[Array] = None):
    """q/k/v: [B, H, N|M, Dh] -> (out [B, H, N, Dh], attn [B, H, N, M]).

    Scale is per-head dim^-0.5 (reference ``attention.py:8-19``).
    ``key_mask`` [B, M]: optional key validity — masked keys get -inf
    logits, so padded nodes receive zero attention (the reference attends
    to its padding slots unmasked; this is the opt-in improvement behind
    the ``masked_attention`` extra)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    if key_mask is not None:
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(key_mask[:, None, None, :] > 0, logits, neg)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32)
    return out, attn


def linear_attention(q: Array, k: Array, v: Array):
    """Non-softmax linear attention (reference ``attention.py:29-40``)."""
    kv = jnp.einsum("bhmd,bhme->bhde", k, v)
    k_sum = jnp.sum(k, axis=-2)                      # [B, H, D]
    out = jnp.einsum("bhnd,bhde->bhne", q, kv)
    norm = jnp.einsum("bhnd,bhd->bhn", q, k_sum)[..., None]
    return out / norm, None


def linear_attention_elu(q: Array, k: Array, v: Array):
    eps = 1e-6
    q = jax.nn.elu(q) + 1.0 + eps
    k = jax.nn.elu(k) + 1.0 + eps
    return linear_attention(q, k, v)


def sample_orthogonal_random_vectors(key, num_rows: int, num_cols: int):
    """Orthogonal random features (reference ``attention.py:62-80``)."""
    num_blocks = math.ceil(num_rows / num_cols)
    blocks = jax.random.normal(key, (num_blocks, num_cols, num_cols))
    norms = jnp.linalg.norm(blocks, axis=-1).reshape(-1, 1)
    q, _ = jnp.linalg.qr(blocks)
    q = jnp.swapaxes(q, -1, -2).reshape(-1, num_cols)
    return q[:num_rows] * norms[:num_rows]


class FavorAttention(nn.Module):
    """FAVOR+ softmax-kernel attention (reference ``attention.py:43-119``)."""

    head_dim: int
    num_orthogonal_features: Optional[int] = None
    generalized: bool = False  # ReLU kernel variant if True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, q, k, v):
        nof = self.num_orthogonal_features or int(
            math.log(self.head_dim) * self.head_dim)
        proj = self.variable(
            "constants", "projection_matrix",
            lambda: sample_orthogonal_random_vectors(
                jax.random.PRNGKey(0), nof, self.head_dim)).value

        if self.generalized:
            def kernel(x, is_query):
                x = x * self.head_dim ** -0.25
                x = jnp.einsum("kd,bhnd->bhnk", proj, x)
                return nn.relu(x) + self.eps
        else:
            def kernel(x, is_query):
                normalizer = x.shape[-1] ** -0.25
                ratio = proj.shape[0] ** -0.5
                dash = jnp.einsum("kd,bhnd->bhnk", proj, normalizer * x)
                diag = jnp.sum(x ** 2, axis=-1, keepdims=True) / 2.0 \
                    * normalizer ** 2
                if is_query:
                    m = jnp.max(dash, axis=-1, keepdims=True)
                else:
                    m = jnp.max(dash, axis=(-1, -2), keepdims=True)
                return ratio * (jnp.exp(dash - diag - m) + self.eps)

        q = kernel(q, True)
        k = kernel(k, False)
        return linear_attention(q, k, v)


class MultiheadAttention(nn.Module):
    """Reference ``attention_gnn.py:MultiheadAttention:8``: 1x1-conv q/k/v
    projections, head split, attention, out projection.

    Inputs are [B, N, C] (channels last).
    """

    embed_dim: int
    num_heads: int
    attention: str = "softmax"  # 'softmax' | 'linear' | 'favor' | 'generalized_favor'

    @nn.compact
    def __call__(self, query, key, value, key_mask=None):
        b = query.shape[0]
        hd = self.embed_dim // self.num_heads

        def split(x):
            # Torch views [B, C, N] as [B, H, C/H, N]; channels-last
            # equivalent: [B, N, H, C/H] -> [B, H, N, C/H].
            return x.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.embed_dim, name="in_proj_q")(query))
        k = split(nn.Dense(self.embed_dim, name="in_proj_k")(key))
        v = split(nn.Dense(self.embed_dim, name="in_proj_v")(value))

        if key_mask is not None and self.attention != "softmax":
            raise ValueError("key_mask requires softmax attention")
        if self.attention == "softmax":
            out, attn = softmax_attention(q, k, v, key_mask=key_mask)
        elif self.attention == "linear":
            out, attn = linear_attention_elu(q, k, v)
        elif self.attention in ("favor", "generalized_favor"):
            out, attn = FavorAttention(
                head_dim=hd,
                generalized=self.attention == "generalized_favor")(q, k, v)
        else:
            raise ValueError(f"unknown attention '{self.attention}'")

        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out), attn
