"""Honest device timing over remote-execution backends.

``jax.block_until_ready`` can return before device completion on tunneled
backends, so every measurement forces a device->host VALUE READ of the final
output; executions on one device serialize, so reading the last result bounds
the whole timed region (same methodology as bench.py).
"""

from __future__ import annotations

import time

import numpy as np


def force(out):
    """Device->host read of one leaf: true completion barrier."""
    import jax

    return np.asarray(jax.tree.leaves(out)[0]).ravel()[0]


def time_fn(f, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean seconds per call of ``f(*args)`` (jitted or not)."""
    for _ in range(warmup):
        out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    force(out)
    return (time.perf_counter() - t0) / iters
