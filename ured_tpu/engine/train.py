"""Joint training of the seven U-RED modules.

TPU-native rebuild of reference ``engine/train.py``: the entire per-batch
computation — source/target encoding, per-part pooling, graph-attention
deformation decoding, analytic ``get_shape``, and all seven live losses
(``train.py:281-335``) — is one jitted, fixed-shape ``train_step``.  The
reference's per-step file I/O (pseudo-label pickles, ``dataset_utils.py:
1101-1143``) is replaced by a precomputed label table; its per-module
``clip_grad_norm_`` calls (``train.py:339-344``) by a per-module clipping
gradient transformation; its StepLR(3, 0.5) by a staircase exponential
schedule.

Run: ``python -m ured_tpu.engine.train [config.json]`` — with no PartNet data
present it trains on the procedural synthetic dataset.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ured_tpu.config import URedConfig
from ured_tpu.losses import (
    assembly_chamfer_loss,
    contrastive_loss,
    pc_consistency,
    pc_consistency_weighted,
    regularization_param,
    residual_retrieval_loss,
    symmetry_loss,
)
from ured_tpu.models.ured import URED
from ured_tpu.ops.deform import group_points_by_part

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def clip_per_module(max_norm: float, frozen=("embedding_layer",)):
    """Per-module gradient clipping, matching the reference's six separate
    ``clip_grad_norm_`` calls (``engine/train.py:339-344``).  Modules in
    ``frozen`` get zero updates — the reference excludes the embedding layer
    from its optimizer entirely (``train_utils/optimizer_dm.py:82-84``)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip_tree(tree):
            gn = optax.global_norm(tree)
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(gn, 1e-12))
            return jax.tree.map(lambda g: g * scale, tree)

        new = {}
        for name, sub in updates.items():
            if name in frozen:
                new[name] = jax.tree.map(jnp.zeros_like, sub)
            else:
                new[name] = clip_tree(sub)
        return type(updates)(new) if not isinstance(updates, dict) else new, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: URedConfig, steps_per_epoch: int):
    """Adam(1e-3, wd 5e-4 as coupled L2) + StepLR(lr_stepsize, lr_decay)
    (reference ``train_utils/optimizer_dm.py:68-104``)."""
    # under gradient accumulation the inner schedule ticks once per
    # optimizer UPDATE (= accum micro-steps), so transition_steps must be
    # sized in updates to keep the StepLR decay at cfg.lr_stepsize EPOCHS
    accum = max(1, int(cfg.extras.get("grad_accum_steps", 1)))
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=max(1, cfg.lr_stepsize * steps_per_epoch // accum),
        decay_rate=cfg.lr_decay,
        staircase=True)

    def not_frozen_mask(params):
        return {k: jax.tree.map(lambda _: k != "embedding_layer", v)
                for k, v in params.items()}

    tx = optax.chain(
        clip_per_module(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay, mask=not_frozen_mask),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
    # failure detection: non-finite gradients skip the update instead of
    # poisoning the parameters (the reference only had a commented-out NaN
    # guard, partnet_dataset.py:63-72 / SURVEY.md §5)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    # gradient accumulation (beyond the reference): `grad_accum_steps: k`
    # averages k micro-batch gradients per optimizer update — k-fold
    # effective batch without k-fold activation memory.  The LR schedule
    # and weight decay tick per optimizer UPDATE, not per micro-step.
    # A per-micro-step non-finite filter runs BEFORE the accumulator: one
    # NaN micro-batch contributes zeros instead of poisoning the whole
    # k-step window (apply_if_finite above still guards the final update).
    if accum > 1:
        tx = optax.chain(_zero_nonfinite_updates(),
                         optax.MultiSteps(tx, every_k_schedule=accum))
    return tx, schedule


def _zero_nonfinite_updates():
    """Zero the ENTIRE incoming update when any element is non-finite."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        ok = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(u)) for u in jax.tree.leaves(updates)]))
        return jax.tree.map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates), state

    return optax.GradientTransformation(init, update)


def compute_losses(cfg: URedConfig, batch: Dict[str, Array],
                   out: Dict[str, Array], epoch: Array,
                   axis_name: Optional[str] = None
                   ) -> Tuple[Array, Dict[str, Array]]:
    """The seven live losses of reference ``engine/train.py:281-335``."""
    x = batch["x"]
    labels = batch["labels"]
    p = cfg.MAX_NUM_PARTS
    deformed = out["deformed"]                 # [B, P, n, 3]
    # The chamfer losses use the *part* mask (which parts exist in the
    # target), not the pseudo-label validity — matching the reference, where
    # mask_part comes from get_part (train.py:130) while source_labels==-1
    # only gates the contrastive labels (contrast_loss.py:78).
    part_mask = out["part_mask"]

    tgt_parts, tgt_parts_valid = group_points_by_part(
        x, labels, p, cfg.num_part_points)

    losses: Dict[str, Array] = {}
    total = jnp.zeros((), jnp.float32)

    if cfg.use_param_loss > 0:
        l = regularization_param(out["params"], part_mask,
                                 axis_name=axis_name)
        losses["param_loss"] = l
        total += cfg.use_param_loss * l

    if cfg.use_chamfer_loss > 0:
        cd_full, cd_part = assembly_chamfer_loss(
            deformed, x, tgt_parts, tgt_parts_valid, part_mask)
        losses["cd_loss_full"] = cd_full
        losses["cd_loss_part"] = cd_part
        total += cfg.use_chamfer_loss * cd_full
        total += cfg.use_chamfer_part_loss * cd_part

    if cfg.use_contrast_loss > 0:
        l = contrastive_loss(out["part_f"], out["src_codes"],
                             batch["src_valid"] * part_mask,
                             axis_name=axis_name)
        losses["contrast_loss"] = l
        total += cfg.use_contrast_loss * l

    if cfg.use_symmetry_loss > 0:
        ref_full, _ = symmetry_loss(
            deformed, x, tgt_parts, tgt_parts_valid, part_mask)
        losses["ref_cd_loss_full"] = ref_full
        total += cfg.use_symmetry_loss * ref_full

    if cfg.use_residuals_reg > 0:
        b, pp, n, _ = deformed.shape
        flat = jax.lax.stop_gradient(deformed).reshape(b, pp * n, 3)
        flat_mask = jnp.repeat(part_mask, n, axis=-1)
        re_loss, re_reg = residual_retrieval_loss(
            x, flat, flat_mask, out["re_residuals"])
        losses["re_reg_loss_full"] = re_loss
        losses["reg_loss_full"] = re_reg
        gate = (epoch > cfg.init_p_m_loss).astype(jnp.float32)
        total += gate * cfg.use_residuals_reg * re_loss
        total += gate * cfg.use_residuals_reg * 0.01 * re_reg

    if cfg.use_recon > 0:
        l_full = pc_consistency(out["recon_full"], x)
        l_src = pc_consistency_weighted(
            out["recon_src"], batch["src_points"], part_mask,
            axis_name=axis_name)
        losses["recon_loss_full"] = l_full
        losses["recon_loss_src"] = l_src
        total += cfg.use_recon * (l_full + l_src)

    losses["all_loss"] = total
    return total, losses


def make_train_step(cfg: URedConfig, model: URED, tx,
                    axis_name: Optional[str] = None):
    """Returns the (jittable) train step closure."""

    def loss_fn(params, batch_stats, batch, epoch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=True, mutable=["batch_stats"])
        total, metrics = compute_losses(cfg, batch, out, epoch, axis_name)
        return total, (metrics, mutated["batch_stats"])

    def train_step(state: TrainState, batch: Dict[str, Array], epoch: Array,
                   src_arrays: Optional[Dict[str, Array]] = None):
        """``src_arrays`` (points [S, n, 3], sems [S], mats [S, 3n, 6])
        keeps the source DB resident on device: the batch then carries only
        ``src_idx`` [B, P] and the gather happens here in-program — the
        host ships ~100 KB of indices per step instead of ~20 MB of
        gathered A-matrices over PCIe/tunnel (the reference re-gathers on
        host every step, ``dataset_utils.py:791-820``)."""
        if src_arrays is not None and "src_idx" in batch:
            batch = dict(batch)
            si = batch.pop("src_idx")  # keep batch keys identical to the
            # pre-gathered and sharded paths (which also pop it)
            batch["src_points"] = src_arrays["points"][si]
            batch["src_sem"] = src_arrays["sems"][si].astype(jnp.int32)
            batch["src_mat"] = src_arrays["mats"][si]
        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, epoch)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=new_opt), metrics

    return train_step


def init_state(cfg: URedConfig, model: URED, tx, sample_batch,
               seed: int = 0) -> TrainState:
    variables = model.init(jax.random.PRNGKey(seed), sample_batch,
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def make_augment_fn(cfg: URedConfig):
    """Jitted per-batch on-device augmentation mirroring the reference
    dataset's ``__getitem__`` distribution (``partnet_dataset.py:50-86``):
    [occlusion mixture when training the partial setting ->] recenter ->
    per-sample ±10° random rotation (gated by ``cfg.random_rot``, true in
    every live reference config)."""
    from ured_tpu.data.occlusion import occlude, random_rotate, recenter

    train_on_partial = bool(cfg.extras.get("train_on_partial", False))
    occ_mode = str(cfg.extras.get("occlusion_mode", "mixed"))

    @jax.jit
    def augment(batch: Dict[str, Array], key: Array) -> Dict[str, Array]:
        k_occ, k_rot = jax.random.split(key)
        out = dict(batch)
        x = batch["x"]
        if train_on_partial:
            x, kept = occlude(x, batch["tgt_sem"], k_occ, mode=occ_mode)
            out["labels"] = jnp.take_along_axis(batch["labels"], kept, 1)
            out["tgt_sem"] = jnp.take_along_axis(batch["tgt_sem"], kept, 1)
        x, _ = recenter(x)
        if cfg.random_rot:
            x = random_rotate(x, k_rot, max_deg=10.0)
        out["x"] = x
        return out

    return augment


def resolve_corpus(cfg: URedConfig, data=None, mesh: bool = False):
    """Data resolution for the CLI path: explicit object > PartNet-layout
    tree pointed at by the config (targets h5 + datasplits + source h5s,
    with the pair archive built on device if missing) > hermetic synthetic
    corpus (fallback).  ``mesh=True`` loads source mesh payloads (for the
    vis/export pipeline)."""
    from ured_tpu.data import corpus, synthetic

    def _maybe_shrink(c):
        # opt-in FLOP cut: truncate the padded part axis to the corpus's
        # true maximum (see corpus.shrink_max_parts)
        if bool(cfg.extras.get("auto_max_parts", False)):
            c = corpus.shrink_max_parts(c, cfg)
        return c

    if data is not None:
        if not hasattr(data, "make_batch"):  # SyntheticData duck type
            data = corpus.from_synthetic(data)
        return _maybe_shrink(data)
    if corpus.real_data_available(cfg):
        print(f"loading PartNet corpus from {cfg.base_dir}")
        c = corpus.from_partnet(cfg, mesh=mesh)
        c.extras["origin"] = "partnet"
        return _maybe_shrink(c)
    print("no PartNet tree found; training on the synthetic corpus")
    # the generator knows the reference's headline categories; 'display'
    # (config_train_display.json) maps to the cabinet-like storage layout,
    # anything unknown falls back to chairs
    cat = {"display": "storage"}.get(cfg.category, cfg.category)
    cat = cat if cat in synthetic._LAYOUTS else "chair"
    c = corpus.from_synthetic(synthetic.generate(
        num_targets=int(cfg.extras.get("synthetic_targets", 64)),
        num_sources=int(cfg.extras.get("synthetic_sources", 64)),
        n_points=cfg.num_target_points,
        points_per_part=cfg.num_part_points,
        max_parts=cfg.MAX_NUM_PARTS, seed=cfg.seed, category=cat))
    c.extras["origin"] = "synthetic"
    return _maybe_shrink(c)


def train(cfg: URedConfig, num_steps: Optional[int] = None,
          data=None, log_every: int = 10, writer=None,
          checkpoint_dir: Optional[str] = None):
    """Training loop: PartNet-layout data when the config points at it,
    synthetic corpus otherwise (see ``resolve_corpus``).  Batches stream
    through the Grain input pipeline (``data.pipeline``); occlusion /
    recenter / rotation augmentation runs jitted on device.

    Returns the final state and last metrics.

    Checkpoints: the full TrainState (params + batch stats + optimizer — the
    reference dropped optimizer state, ``train.py:349-358``) every
    ``cfg.save_epoch`` epochs; ``cfg.init_dm`` / ``cfg.init_re`` restore the
    dm / re module groups from ``cfg.dm_model_path`` / ``cfg.re_model_path``.

    Multi-chip: ``cfg.mesh_dp`` x ``cfg.mesh_db`` > 1 (``mesh_dp: 0`` =
    every visible device) builds a device mesh and drives the explicit
    shard_map step — batch dp-sharded, gradients/metrics pmean'd, BatchNorm
    statistics SyncBN'd over ``dp``, and the resident source DB sharded
    over ``db`` (the TPU-native counterpart of the reference's
    DataParallel/DDP launch, ``Density_aware_Chamfer_Distance/train.py:
    64-68``).  Numerics match single-chip exactly (SyncBN parity is
    tested in ``tests/test_parallel.py``).
    """
    from ured_tpu.data.pipeline import make_input_pipeline
    from ured_tpu.parallel.mesh import resolve_mesh

    mesh = resolve_mesh(cfg)
    if mesh is not None:
        # SyncBN must be decided before the model is constructed
        cfg.extras.setdefault("sync_bn", True)

    data = resolve_corpus(cfg, data)

    num_targets = len(data)
    bs = min(cfg.batch_size, num_targets)
    if mesh is not None:
        dp = mesh.shape["dp"]
        if bs % dp:
            bs = max(dp, (bs // dp) * dp)
            print(f"batch_size rounded to {bs} (divisible by dp={dp})")
    steps_per_epoch = max(1, num_targets // bs)
    tx, schedule = make_optimizer(cfg, steps_per_epoch)
    model = URED(cfg)

    sample = {k: jnp.asarray(v)
              for k, v in data.make_batch(np.arange(bs)).items()}
    state = init_state(cfg, model, tx, sample, seed=cfg.seed)

    if cfg.init_dm or cfg.init_re:
        from ured_tpu.utils.checkpoint import restore_groups

        if cfg.init_dm:
            state = restore_groups(cfg.dm_model_path, state, groups=("dm",))
        if cfg.init_re:
            state = restore_groups(cfg.re_model_path, state, groups=("re",))

    # crash/preemption resume: with the `resume` extra, pick up the full
    # TrainState (params + batch stats + optimizer moments + LR count) from
    # the newest checkpoint and skip the epochs it covers — the capability
    # the reference lacks (its checkpoints drop optimizer state,
    # ref train.py:349-358, so a restart resets Adam moments)
    start_step = 0
    if checkpoint_dir and bool(cfg.extras.get("resume", False)):
        from ured_tpu.utils.checkpoint import latest_step, restore_checkpoint

        last = latest_step(checkpoint_dir)
        if last is not None:
            state = restore_checkpoint(checkpoint_dir, state)
            # the restored optimizer step count is the ground truth for how
            # many steps the checkpoint covers — labels (epoch in older
            # trees, steps-completed now) need not be trusted, and a final
            # MID-epoch save (step+1 == total_steps) resumes exactly where
            # it stopped instead of skipping the rest of that epoch
            start_step = int(state.step)
            print(f"resume: restored checkpoint {last}; "
                  f"continuing at step {start_step}", flush=True)

    augment = make_augment_fn(cfg)

    # device-resident source DB (default): the full source tensors ship to
    # the device once and every batch carries only src_idx
    resident = bool(cfg.extras.get("resident_sources", True)) \
        and hasattr(data, "make_light_batch")
    src_arrays = None
    if resident:
        src_arrays = {"points": jnp.asarray(data.src_points),
                      "sems": jnp.asarray(data.src_sems),
                      "mats": jnp.asarray(data.src_mats)}

    dp_sharding = None
    if mesh is not None:
        from ured_tpu.parallel.retrieval import pad_to_multiple
        from ured_tpu.parallel.sharded import make_sharded_train_step

        if src_arrays is not None:
            # gather indices only ever point at real rows, so zero-padding
            # to the db axis size is safe
            src_arrays = {k: pad_to_multiple(v, mesh.shape["db"])
                          for k, v in src_arrays.items()}
        step_fn, place = make_sharded_train_step(
            cfg, model, tx, mesh, explicit=True,
            resident_sources=src_arrays is not None)
        placed = place(state, sample, 0, src_arrays)
        state = placed[0]
        if src_arrays is not None:
            src_arrays = placed[3]
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp_sharding = NamedSharding(mesh, P("dp"))
    else:
        step_fn = jax.jit(make_train_step(cfg, model, tx))

    total_steps = num_steps if num_steps is not None \
        else cfg.epochs * steps_per_epoch
    epochs_needed = -(-total_steps // steps_per_epoch)  # ceil
    batches = make_input_pipeline(
        data, None, bs, seed=cfg.seed, shuffle=True,
        num_epochs=epochs_needed, light=resident,
        worker_count=int(cfg.extras.get("pipeline_workers", 0)))

    key = jax.random.PRNGKey(cfg.seed)
    metrics = {}
    pending = None  # (step, device metrics) read one step late: the
    # device->host metric transfer then overlaps the next step's execution
    # instead of serializing after it (the per-step float() reads were the
    # largest wall-clock term after the device time itself)
    t0 = time.perf_counter()

    def flush(pending):
        step, dev = pending
        host = jax.device_get(dev)          # one batched transfer
        vals = {k: float(v) for k, v in host.items()}
        if writer is not None:
            writer.write(step, vals)
        if step % log_every == 0:
            dt = time.perf_counter() - t0
            epoch = step // steps_per_epoch
            print(f"step {step} epoch {epoch} "
                  f"loss {vals['all_loss']:.4f} "
                  f"cd {vals.get('cd_loss_full', 0):.4f} "
                  f"({dt:.1f}s)")

    # on-demand device profiling: `profile_dir` extra traces steps
    # [profile_start, profile_start + profile_steps) into a TensorBoard/
    # xprof trace (SURVEY §5: the reference has no tracing at all)
    profile_dir = cfg.extras.get("profile_dir")
    profile_start = int(cfg.extras.get("profile_start", 2))
    profile_steps = int(cfg.extras.get("profile_steps", 3))
    profiling = False

    for step, batch in enumerate(batches):
        if step >= total_steps:
            break
        epoch = step // steps_per_epoch
        key, sub = jax.random.split(key)   # split even when skipping:
        # keeps the augmentation RNG stream aligned with an uninterrupted run
        if step < start_step:
            continue
        if profile_dir and step == start_step + profile_start:
            jax.profiler.start_trace(str(profile_dir))
            profiling = True
        if dp_sharding is not None:
            batch = {k: jax.device_put(jnp.asarray(v), dp_sharding)
                     for k, v in batch.items()}
        batch = augment(batch, sub)
        state, metrics = step_fn(state, batch, jnp.asarray(epoch),
                                 src_arrays)
        if profiling and step + 1 >= start_step + profile_start + \
                profile_steps:
            jax.block_until_ready(metrics["all_loss"])
            jax.profiler.stop_trace()
            profiling = False
            print(f"profile trace written to {profile_dir}")
        if pending is not None:
            flush(pending)
        pending = (step, metrics)
        end_of_epoch = (step + 1) % steps_per_epoch == 0
        # always persist the final epoch too, so short runs (epochs <
        # save_epoch) leave a loadable checkpoint for evaluate/vis
        if checkpoint_dir \
                and ((end_of_epoch and (epoch + 1) % cfg.save_epoch == 0)
                     or step + 1 == total_steps):
            from ured_tpu.utils.checkpoint import save_checkpoint

            # label = optimizer steps completed (strictly monotonic even
            # for the extra final-step save of a short/mid-epoch run)
            save_checkpoint(checkpoint_dir, state, step=step + 1)
    if pending is not None:
        flush(pending)
    return state, metrics


def main(argv):
    cfg = URedConfig.from_json(argv[1]) if len(argv) > 1 else URedConfig(
        epochs=2, batch_size=8)
    import os

    from ured_tpu.utils.logging import MetricWriter

    os.makedirs(cfg.log_path, exist_ok=True)
    cfg.to_json(os.path.join(cfg.log_path, "config.json"))  # ref train.py:367
    writer = MetricWriter(cfg.log_path)
    try:
        train(cfg, writer=writer,
              checkpoint_dir=os.path.join(cfg.log_path, "checkpoints"))
    finally:
        writer.close()


if __name__ == "__main__":
    main(sys.argv)


from ured_tpu.utils.cli import make_cli

cli = make_cli(main)
