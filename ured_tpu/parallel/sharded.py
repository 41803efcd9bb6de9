"""Sharded training step.

Two equivalent paths:

* **GSPMD (default)**: ``jit`` with batch sharded over ``dp`` and parameters
  replicated; XLA inserts the gradient ``psum`` and the contrastive
  all-gather automatically from the shardings.
* **Explicit (shard_map)**: the per-device step runs under ``shard_map``
  with hand-placed collectives — ``lax.pmean`` on grads and
  ``lax.all_gather`` for the contrastive negatives pool (the TPU-native
  replacement for the reference's NCCL hooks,
  ``loss/contrast_loss.py:35-58``).  This is the path ``dryrun_multichip``
  exercises since it proves the collectives themselves.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ured_tpu.config import URedConfig
from ured_tpu.engine.train import TrainState, make_train_step
from ured_tpu.models.ured import URED


def shard_batch_specs(batch: Dict[str, Any]) -> Dict[str, P]:
    """Every batch tensor is sharded along its leading (batch) axis."""
    return {k: P("dp") for k in batch}


def make_sharded_train_step(cfg: URedConfig, model: URED, tx, mesh: Mesh,
                            explicit: bool = True,
                            resident_sources: bool = False):
    """Build a jitted multi-device train step over ``mesh``.

    With ``explicit=True`` the body runs under ``shard_map`` with manual
    collectives over the ``dp`` axis; otherwise plain GSPMD jit.
    Parameters/optimizer state are replicated; batch is dp-sharded.

    ``resident_sources=True``: the step takes a fourth argument — the
    source DB tensors sharded over the ``db`` mesh axis (at reference scale
    the A-matrix table alone is ~0.5 GB; at 100k sources ~7 GB — the same
    axis the retrieval DB shards over).  Batches then carry only
    ``src_idx``; the cross-shard gather happens under GSPMD *outside* the
    shard_map body, with the gathered tensors constrained back to ``dp``
    sharding.
    """
    dp_sharding = NamedSharding(mesh, P("dp"))

    def gather_sources(batch, src_arrays):
        if not resident_sources or src_arrays is None \
                or "src_idx" not in batch:
            return batch
        si = batch["src_idx"]
        out = dict(batch)
        out.pop("src_idx")
        gathered = {
            "src_points": src_arrays["points"][si],
            "src_sem": src_arrays["sems"][si].astype(jnp.int32),
            "src_mat": src_arrays["mats"][si],
        }
        for k, v in gathered.items():
            out[k] = jax.lax.with_sharding_constraint(v, dp_sharding)
        return out

    if explicit:
        inner = make_train_step(cfg, model, tx, axis_name="dp")

        def spmd_step(state: TrainState, batch, epoch, src_arrays=None):
            batch = gather_sources(batch, src_arrays)
            return jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(P(), shard_batch_specs(batch), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(state, batch, epoch)

        step = spmd_step
    else:
        inner = make_train_step(cfg, model, tx, axis_name=None)

        def gspmd_step(state: TrainState, batch, epoch, src_arrays=None):
            batch = gather_sources(batch, src_arrays)
            return inner(state, batch, epoch)

        step = gspmd_step

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    def place(state, batch, epoch, src_arrays=None):
        state = jax.device_put(state, repl)
        batch = {k: jax.device_put(v, dp) for k, v in batch.items()}
        epoch = jax.device_put(jnp.asarray(epoch), repl)
        if src_arrays is None:
            return state, batch, epoch
        # constructed lazily so dp-only meshes (no "db" axis) keep working
        # when resident sources are unused
        db0 = NamedSharding(mesh, P("db"))
        src_arrays = {k: jax.device_put(jnp.asarray(v), db0)
                      for k, v in src_arrays.items()}
        return state, batch, epoch, src_arrays

    return jax.jit(step), place
