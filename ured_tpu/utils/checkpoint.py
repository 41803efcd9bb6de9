"""Checkpointing with the reference's two-group load granularity.

The reference saves a dict of 7 state_dicts every ``save_epoch`` epochs
(``engine/train.py:349-358``) and loads them in two groups: ``dm`` (6
modules, ``train.py:50-63``) and ``re`` (the retrieval-residual decoder,
``train.py:77-81``); optimizer state is NOT saved there — we save it, fixing
that gap, but keep the group-selective restore.

Orbax saves the whole TrainState PyTree; ``restore_groups`` lets you pull
only the dm or re module subtrees out of a checkpoint into a fresh state.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import orbax.checkpoint as ocp

DM_MODULES = (
    "target_encoder_full",
    "param_decoder_full",
    "recon_decoder_full",
    "src_encoder_all",
    "recon_decoder_src",
    "embedding_layer",
)
RE_MODULES = ("re_order_decoder_full",)


def _mgr(path: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))


def save_checkpoint(path: str, state, step: int,
                    max_to_keep: int = 5) -> None:
    mgr = _mgr(path, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(path: str) -> Optional[int]:
    mgr = _mgr(path)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(path: str, target, step: Optional[int] = None):
    """Restore a full TrainState (shape/dtype template = ``target``).

    ``path`` is the checkpoints root; pointing at a specific step directory
    (``.../checkpoints/59``) also works — the reference's ``dm_model_path``
    names a concrete file, so the CLI configs map naturally either way."""
    import os

    base = os.path.basename(os.path.normpath(path))
    if step is None and base.isdigit() and (
            os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
            or os.path.exists(os.path.join(path, "default"))):
        # a digit-named dir holding checkpoint contents is a step dir; a
        # digit-named checkpoints ROOT (e.g. a date) is left alone
        path = os.path.dirname(os.path.normpath(path))
        step = int(base)
    mgr = _mgr(path)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {path}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return out


def restore_groups(path: str, state, groups: Iterable[str] = ("dm", "re"),
                   step: Optional[int] = None):
    """Selective restore: copy only the requested module groups' params and
    batch stats from the checkpoint into ``state`` (reference init_dm /
    init_re semantics)."""
    restored = restore_checkpoint(path, state, step)
    wanted = set()
    for g in groups:
        wanted |= set(DM_MODULES if g == "dm" else RE_MODULES)

    def merge(old: dict, new: dict) -> dict:
        return {k: (new[k] if k in wanted else old[k]) for k in old}

    return state.replace(
        params=merge(dict(state.params), dict(restored.params)),
        batch_stats=merge(dict(state.batch_stats),
                          dict(restored.batch_stats)))
