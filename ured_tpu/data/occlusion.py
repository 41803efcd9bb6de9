"""On-device partial-view (occlusion) synthesis.

The four generators of reference ``dataset/gen_occ_point.py`` — kNN-ball
around 1/2/4/8 centers, half-space slice, uniform random, drop-one-part —
rebuilt as fixed-shape batched JAX functions: every generator emits exactly
``N/2`` surviving points via a keyed top-k selection (drop-preference +
random tie-break), so the whole augmentation runs inside jit on device at
batch granularity instead of per-sample numpy in dataloader workers.

Two reference bugs are deliberately NOT replicated: the ``try/finally`` that
made the ball generator always fall through to random once its cache existed
(``gen_occ_point.py:20-24``), and the per-model pickle cache of the kNN
table (we compute the kNN on device; it costs one [N, N] matmul).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ured_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array


def _keep_half(drop: Array, key: Array) -> Array:
    """drop [N] bool -> indices [N/2] of kept points.

    Keeps non-dropped points first (random subset when more than N/2
    survive), mirroring the reference's random trim (gen_occ_point.py:47-51).
    """
    n = drop.shape[0]
    score = drop.astype(jnp.float32) * 2.0 + \
        jax.random.uniform(key, (n,))
    _, idx = jax.lax.top_k(-score, n // 2)
    return jnp.sort(idx).astype(jnp.int32)


def _occ_ball(points: Array, sem: Array, key: Array,
              num_centers: int) -> Array:
    """Remove the kNN balls around ``num_centers`` random seed points."""
    n = points.shape[0]
    cancel_each = n // 2 // num_centers
    k1, k2 = jax.random.split(key)
    centers = jax.random.choice(k1, n, (num_centers,), replace=False)
    d = pairwise_sqdist(points[centers], points)      # [C, N]
    # the cancel_each nearest points of each center get dropped
    _, nbr = jax.lax.top_k(-d, cancel_each)           # [C, cancel_each]
    drop = jnp.zeros((n,), bool).at[nbr.reshape(-1)].set(True)
    return _keep_half(drop, k2)


def _occ_slice(points: Array, sem: Array, key: Array) -> Array:
    """Keep the half farthest from a random plane (gen_occ_point.py:56-73)."""
    n = points.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    center = points[jax.random.randint(k1, (), 0, n)]
    direction = jax.random.uniform(k2, (3,), minval=1e-3, maxval=1.0)
    direction = direction / jnp.linalg.norm(direction)
    dist = jnp.abs((points - center) @ direction)     # [N]
    drop = dist <= jnp.median(dist)                   # near half dropped
    return _keep_half(drop, k3)


def _occ_random(points: Array, sem: Array, key: Array) -> Array:
    n = points.shape[0]
    return _keep_half(jnp.zeros((n,), bool), key)


def _occ_part(points: Array, sem: Array, key: Array) -> Array:
    """Drop one random semantic part (gen_occ_point.py:84-99): keep the rest,
    trimming or falling back toward random to reach exactly N/2."""
    n = points.shape[0]
    k1, k2 = jax.random.split(key)
    pick = sem[jax.random.randint(k1, (), 0, n)]
    drop = sem == pick
    # if dropping the part leaves < N/2 points, _keep_half automatically
    # refills from the dropped part at random (score ordering), which matches
    # the reference's fallback to uniform random.
    return _keep_half(drop, k2)


@partial(jax.jit, static_argnames=("mode",))
def occlude(points: Array, sem: Array, key: Array,
            mode: str = "mixed") -> Tuple[Array, Array]:
    """Batched occlusion synthesis.

    Args:
      points: [B, N, 3]; sem: [B, N] int semantics; key: PRNG key.
      mode: 'ball' | 'slice' | 'random' | 'part' | 'mixed' (random choice per
        sample with the reference's 30/30/30/10 split,
        ``dataset/shapenet_dataset.py:50-58``).
    Returns:
      (occluded points [B, N/2, 3], kept indices [B, N/2]).
    """
    b, n, _ = points.shape
    keys = jax.random.split(key, b + 1)
    sample_keys, choice_key = keys[:b], keys[b]

    def one(pts, s, k):
        kb, kc = jax.random.split(k)
        if mode == "ball":
            # reference picks 1/2/4/8 centers uniformly
            branch = jax.random.randint(kb, (), 0, 4)
            idx = jax.lax.switch(
                branch,
                [lambda: _occ_ball(pts, s, kc, 1),
                 lambda: _occ_ball(pts, s, kc, 2),
                 lambda: _occ_ball(pts, s, kc, 4),
                 lambda: _occ_ball(pts, s, kc, 8)])
        elif mode == "slice":
            idx = _occ_slice(pts, s, kc)
        elif mode == "random":
            idx = _occ_random(pts, s, kc)
        elif mode == "part":
            idx = _occ_part(pts, s, kc)
        elif mode == "mixed":
            u = jax.random.uniform(kb)
            nc = jax.random.randint(jax.random.fold_in(kb, 1), (), 0, 4)
            idx = jax.lax.cond(
                u < 0.3,
                lambda: jax.lax.switch(
                    nc,
                    [lambda: _occ_ball(pts, s, kc, 1),
                     lambda: _occ_ball(pts, s, kc, 2),
                     lambda: _occ_ball(pts, s, kc, 4),
                     lambda: _occ_ball(pts, s, kc, 8)]),
                lambda: jax.lax.cond(
                    u < 0.6,
                    lambda: _occ_random(pts, s, kc),
                    lambda: jax.lax.cond(
                        u < 0.9,
                        lambda: _occ_slice(pts, s, kc),
                        lambda: _occ_part(pts, s, kc))))
        else:
            raise ValueError(f"unknown occlusion mode '{mode}'")
        return pts[idx], idx

    occ, idx = jax.vmap(one)(points, sem, sample_keys)
    return occ, idx


def recenter(points: Array) -> Tuple[Array, Array]:
    """Subtract the centroid (reference ``partnet_dataset.py:61-62``)."""
    mean = jnp.mean(points, axis=-2, keepdims=True)
    return points - mean, mean


def random_rotate(points: Array, key: Array,
                  max_deg: float = 10.0) -> Array:
    """Small random rotation per sample (reference
    ``partnet_dataset.py:73-78``, X->Y->Z composition)."""
    b = points.shape[0]
    ang = jax.random.uniform(key, (b, 3), minval=-max_deg, maxval=max_deg)
    r = jnp.deg2rad(ang)
    cx, sx = jnp.cos(r[:, 0]), jnp.sin(r[:, 0])
    cy, sy = jnp.cos(r[:, 1]), jnp.sin(r[:, 1])
    cz, sz = jnp.cos(r[:, 2]), jnp.sin(r[:, 2])
    zero = jnp.zeros_like(cx)
    one = jnp.ones_like(cx)
    rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx], -1).reshape(b, 3, 3)
    ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy], -1).reshape(b, 3, 3)
    rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one], -1).reshape(b, 3, 3)
    rot = rz @ ry @ rx
    return jnp.einsum("bij,bnj->bni", rot, points)
