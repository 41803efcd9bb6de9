"""Legacy retrieval/training utilities kept for capability parity.

  * ``compute_mahalanobis``  <- reference
    ``train_utils/construct_candidates.py:12`` (legacy retrieval distance
    between a target code and per-source Gaussians).
  * ``select_sources``       <- ``train_utils/retraining_utils.py:
    get_sources_accordingly:7`` (exhaustive / random / retrieval source
    selection strategies).
  * ``make_autodecoder_optimizer`` <- ``train_utils/optimizer_dm.py:
    define_optimizer_re:107-139`` (optimizer over networks + learnable
    source latents, with a higher learning rate for the sigmas).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array


def compute_mahalanobis(target_code: Array, source_mu: Array,
                        source_sigma: Optional[Array] = None,
                        activation=jax.nn.sigmoid,
                        clip_vec: bool = False) -> Array:
    """Mahalanobis-style retrieval distance of a target code against
    diagonal source Gaussians (reference
    ``train_utils/construct_candidates.py:12-26`` exactly: sigma acts as a
    multiplicative per-dimension precision — ``sum((q - mu) * sigma)^2`` —
    not a divisor; ``sigmas=None`` degrades to plain squared L2, and
    ``clip_vec`` clamps query codes to [-100, 100] first, the config's
    ``clip_vec`` knob).

    target_code [B, C], source_mu [S, C], source_sigma [S, C]
    (pre-activation, squashed by ``activation``) -> distances [B, S].
    """
    if source_sigma is not None and activation is not None:
        source_sigma = activation(source_sigma) + 1e-6
    if clip_vec:
        target_code = jnp.clip(target_code, -100.0, 100.0)
    diff = target_code[:, None, :] - source_mu[None, :, :]
    if source_sigma is not None:
        diff = diff * source_sigma[None]
    return jnp.sum(jnp.square(diff), axis=-1)


def select_sources(strategy: str, num_sources: int, batch_size: int,
                   rng: np.random.Generator,
                   scores: Optional[np.ndarray] = None,
                   k: int = 1) -> np.ndarray:
    """Source-selection strategies for (re)training.

    'exhaustive': every source for every sample -> [S*B] tiled ids;
    'random': k random sources per sample -> [B, k];
    'retrieval': top-k by score (scores [B, S], lower is better) -> [B, k].
    """
    if strategy == "exhaustive":
        return np.repeat(np.arange(num_sources), batch_size)
    if strategy == "random":
        return rng.integers(0, num_sources, size=(batch_size, k))
    if strategy == "retrieval":
        if scores is None:
            raise ValueError("retrieval strategy needs scores")
        return np.argsort(scores, axis=1)[:, :k]
    raise ValueError(f"unknown strategy '{strategy}'")


def make_autodecoder_optimizer(learning_rate: float,
                               sigma_learning_rate: float = 0.01,
                               weight_decay: float = 5e-4,
                               lr_stepsize_steps: int = 1000,
                               lr_decay: float = 0.5):
    """Optimizer for the auto-decoder retrieval path: network params +
    learnable per-source (latents, variances) at the base rate, sigmas at a
    larger rate — the param-group structure of the reference's
    ``define_optimizer_re``.

    Use with a params tree shaped {'net': ..., 'latents': ..., 'variances':
    ..., 'sigmas': ...}.
    """
    def schedule(base):
        return optax.exponential_decay(base, lr_stepsize_steps, lr_decay,
                                       staircase=True)

    def tag(params):
        return {k: ("sigma" if k == "sigmas" else "base")
                for k in params}

    return optax.multi_transform(
        {
            "base": optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(schedule(learning_rate))),
            "sigma": optax.chain(
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(
                    schedule(sigma_learning_rate))),
        },
        tag)
