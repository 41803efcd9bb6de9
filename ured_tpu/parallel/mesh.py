"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, db: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (dp, db) mesh.

    dp defaults to ``len(devices) // db``.  On a real slice the axes map onto
    ICI; on CPU tests they map onto the 8 virtual devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % db:
            raise ValueError(f"{n} devices not divisible by db={db}")
        dp = n // db
    if dp * db != n:
        raise ValueError(f"dp*db = {dp * db} != {n} devices")
    arr = np.asarray(devices).reshape(dp, db)
    return Mesh(arr, axis_names=("dp", "db"))
