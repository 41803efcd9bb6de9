"""F-score at a squared-distance threshold.

Port of reference ``utils_v2/metrics/CD/fscore.py:3-16``.
"""

import jax.numpy as jnp


def fscore(dist1, dist2, threshold: float = 0.0001):
    """dist1/dist2: [B, N]/[B, M] squared distances. Returns (f, p1, p2) [B]."""
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=-1)
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=-1)
    f = 2.0 * precision_1 * precision_2 / (precision_1 + precision_2)
    f = jnp.where(jnp.isnan(f), 0.0, f)
    return f, precision_1, precision_2
