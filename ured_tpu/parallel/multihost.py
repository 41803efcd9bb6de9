"""Multi-host (DCN) runtime initialization.

The TPU-native replacement for the reference's NCCL/Slurm rendezvous
(``Density_aware_Chamfer_Distance/utils/env.py:13-50``): JAX's built-in
distributed runtime.  On Cloud TPU pods ``jax.distributed.initialize()``
auto-discovers coordinator/process ids; explicit args cover Slurm-style
launches.  Collectives then ride ICI within a slice and DCN across slices
with no further code changes — the mesh in ``parallel.mesh`` simply sees
all global devices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize the multi-host runtime; no-op on a single host.

    Slurm launches: reads SLURM_NTASKS / SLURM_PROCID / the first node as
    coordinator when explicit args are absent (the reference's
    ``_init_dist_slurm`` role).
    Returns {'process_index', 'process_count', 'local_devices',
    'global_devices'}.
    """
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ["SLURM_PROCID"])
        if coordinator_address is None:
            nodelist = os.environ.get("SLURM_STEP_NODELIST", "")
            head = nodelist.split(",")[0].replace("[", "").split("-")[0]
            coordinator_address = f"{head}:12345"

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }


def is_primary() -> bool:
    """Rank-0 gate for logging/checkpointing (the reference's rank-aware
    logger, ``utils/env.py:60-73``)."""
    return jax.process_index() == 0


def seed_everything(seed: int, per_process: bool = True) -> int:
    """Deterministic per-process seeding (reference ``utils/env.py:53``)."""
    import numpy as np
    import random

    s = seed + (jax.process_index() if per_process else 0)
    random.seed(s)
    np.random.seed(s % (2 ** 32))
    return s
