"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def resolve_mesh(cfg) -> Optional[Mesh]:
    """Mesh for the flagship CLIs from ``cfg.mesh_dp`` x ``cfg.mesh_db``.

    Returns None for the single-device configuration (dp=db=1 — the
    default, matching the reference's single-GPU path).  ``mesh_dp: 0``
    auto-sizes the data-parallel axis to use every visible device
    (``device_count // mesh_db``) — the TPU-native counterpart of the
    reference's DataParallel/DDP launch surface
    (``Density_aware_Chamfer_Distance/train.py:64-68``).
    """
    dp, db = int(cfg.mesh_dp), int(cfg.mesh_db)
    if db < 1:
        raise ValueError(f"mesh_db must be >= 1, got {db}")
    if dp < 0:
        raise ValueError(f"mesh_dp must be >= 0 (0 = auto), got {dp}")
    if dp == 0:
        n = jax.device_count()
        if n % db:
            raise ValueError(f"{n} devices not divisible by mesh_db={db}")
        dp = n // db
    if dp * db <= 1:
        return None
    devices = jax.devices()
    if dp * db > len(devices):
        raise ValueError(f"mesh {dp}x{db} needs {dp * db} devices, "
                         f"only {len(devices)} visible")
    return make_mesh(dp=dp, db=db, devices=devices[: dp * db])


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
