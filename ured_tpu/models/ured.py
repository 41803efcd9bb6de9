"""The assembled U-RED model: all seven trainable modules in one Flax tree.

Mirrors the module set built by reference ``engine/train.py:get_models:39-101``
(src/tgt encoders, two recon decoders, retrieval-residual decoder, the
graph-attention deformation decoder, and the 42-class semantic embedding),
with identical sub-tree names so checkpoints keep the reference's dm/re group
granularity (``train.py:349-358``).

The forward pass is the whole per-batch computation of the reference hot loop
(``train.py:186-280``) as one fixed-shape function: per-part pooling is a
segment mean, ragged part lists are masked dense tensors, and every module
call is batched.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ured_tpu.config import URedConfig
from ured_tpu.models.deformnet import DeformNetMatching, ResidualNet
from ured_tpu.models.encoder import TargetEncoder
from ured_tpu.ops.deform import (
    gather_part_feature,
    get_shape,
    part_aabb,
    part_segment_mean,
)

Array = jax.Array


class URED(nn.Module):
    """Joint retrieval + deformation model."""

    cfg: URedConfig

    def setup(self):
        c = self.cfg
        dtype = {"bfloat16": jnp.bfloat16,
                 "float32": None}.get(c.compute_dtype, None)
        # SyncBN: pmean batch statistics over the dp mesh axis so multi-chip
        # training numerics match single-chip (requires the explicit
        # shard_map step, which binds the axis name)
        bn_axis = "dp" if c.extras.get("sync_bn") else None
        # "shifted" halves the HBM reads per BatchNorm (one-pass shifted
        # sums with shift = the running mean); "two_pass" is the exactness
        # baseline.  Default shifted: measured 102.8 vs 113.0 ms/step f32
        # at reference scale (benchmarks/onchip_r3.py bnstats, v5e) — the
        # two-pass reads were the whole r02->r04 train-step drift — and
        # stats parity vs two_pass is property-tested (tests/test_masked_bn
        # ::test_shifted_stats_match_two_pass, incl. the zero-running-mean
        # worst case).  See MaskedBatchNorm.stats_mode.
        bn_stats = c.extras.get("bn_stats_mode", "shifted")
        self.target_encoder_full = TargetEncoder(
            embedding_size=c.target_latent_dim, sem_size=c.sem_latent_dim,
            dtype=dtype, axis_name=bn_axis, bn_stats_mode=bn_stats,
            name="target_encoder_full")
        self.src_encoder_all = TargetEncoder(
            embedding_size=c.source_latent_dim, is_src=True,
            sem_size=c.sem_latent_dim, dtype=dtype, axis_name=bn_axis,
            bn_stats_mode=bn_stats, name="src_encoder_all")
        self.recon_decoder_full = ResidualNet(
            c.target_latent_dim * 2, dtype=dtype, axis_name=bn_axis,
            bn_stats_mode=bn_stats, name="recon_decoder_full")
        self.recon_decoder_src = ResidualNet(
            c.source_latent_dim * 2, dtype=dtype, axis_name=bn_axis,
            bn_stats_mode=bn_stats, name="recon_decoder_src")
        self.re_order_decoder_full = ResidualNet(
            c.target_latent_dim * 2, dtype=dtype, axis_name=bn_axis,
            bn_stats_mode=bn_stats, name="re_order_decoder_full")
        self.param_decoder_full = DeformNetMatching(
            input_dim=c.source_latent_dim * 3,
            graph_dim=c.source_latent_dim,
            part_latent_dim=c.part_latent_dim,
            max_num_parts=c.MAX_NUM_PARTS,
            matching=False, axis_name=bn_axis, bn_stats_mode=bn_stats,
            mask_attention=bool(c.extras.get("masked_attention", False)),
            name="param_decoder_full")
        self.embedding_layer = nn.Embed(
            c.num_semantic_classes, c.sem_latent_dim, name="embedding_layer")

    # ---- individual stages (usable for eval / retrieval pipelines) ----

    def encode_sources(self, src_points: Array, src_sem: Array,
                       train: bool = True, valid: Optional[Array] = None):
        """src_points [B, P, n, 3], src_sem [B, P] int ->
        (codes [B, P, C], per_point [B, P, n, C]).  ``valid`` [B, P]: part
        slots that may contribute to BatchNorm statistics (padded slots
        carry duplicated gather rows and must not)."""
        sem_f = self.embedding_layer(src_sem)
        return self.src_encoder_all(src_points, sem_f, train=train,
                                    valid=valid)

    def encode_target(self, x: Array, tgt_sem: Array, train: bool = True):
        """x [B, N, 3], tgt_sem [B, N] int -> (code [B, C], pp [B, N, C])."""
        sem_f = self.embedding_layer(tgt_sem)
        return self.target_encoder_full(x, sem_f, train=train)

    def source_recon(self, src_codes: Array, src_pp: Array,
                     train: bool = True,
                     valid: Optional[Array] = None) -> Array:
        """Reconstruct source parts from (global code, per-point feature)
        (reference ``train.py:213-218``; code first in the concat)."""
        b, p, n, c = src_pp.shape
        code = jnp.broadcast_to(src_codes[:, :, None, :], (b, p, n, c))
        inp = jnp.concatenate([code, src_pp], axis=-1).reshape(b * p, n, 2 * c)
        mask = None if valid is None else valid.reshape(b * p, 1)
        out = self.recon_decoder_src(inp, train=train, mask=mask)
        return out.reshape(b, p, n, 3)

    def target_recon(self, tgt_code: Array, per_point: Array,
                     train: bool = True) -> Array:
        """Reference ``train.py:246-250``; per-point feature first."""
        b, n, c = per_point.shape
        code = jnp.broadcast_to(tgt_code[:, None, :], (b, n, c))
        inp = jnp.concatenate([per_point, code], axis=-1)
        return self.recon_decoder_full(inp, train=train)

    def retrieval_residuals(self, per_point: Array, part_f: Array,
                            labels: Array, train: bool = True) -> Array:
        """Residual metric input: concat(per-point feature, its part's mean
        feature) (reference ``train.py:124-126,257``)."""
        part_of_point = gather_part_feature(part_f, labels)
        inp = jnp.concatenate([per_point, part_of_point], axis=-1)
        return self.re_order_decoder_full(inp, train=train)

    def decode_params(self, tgt_code: Array, src_codes: Array,
                      per_point: Optional[Array] = None,
                      train: bool = True,
                      part_mask: Optional[Array] = None) -> Array:
        return self.param_decoder_full(tgt_code, src_codes, per_point,
                                       train=train, part_mask=part_mask)

    # ---- full training forward (reference train.py:186-280) ----

    def __call__(self, batch: Dict[str, Array], train: bool = True
                 ) -> Dict[str, Array]:
        """Runs every module on one batch.

        batch keys:
          x            [B, N, 3]  target clouds
          labels       [B, N]     int part ids in [0, P)
          tgt_sem      [B, N]     int semantic class per point
          src_points   [B, P, n, 3] retrieved source parts
          src_sem      [B, P]     int semantic class per source part
          src_mat      [B, P, 3n, 6] parametric models of the sources
        Returns a dict of every intermediate the losses need.
        """
        cfg = self.cfg
        x = batch["x"]
        labels = batch["labels"]
        p_parts = cfg.MAX_NUM_PARTS

        # valid part slots: padded slots gather duplicated source rows and
        # carry zero pooled features — they must not contribute to BatchNorm
        # batch statistics (the root cause of the round-2 stat collapse)
        src_valid = batch.get("src_valid")
        if src_valid is None:
            counts = jnp.sum(jax.nn.one_hot(labels, p_parts), axis=-2)
            src_valid = (counts > 0).astype(jnp.float32)

        src_codes, src_pp = self.encode_sources(
            batch["src_points"], batch["src_sem"], train=train,
            valid=src_valid)
        recon_src = self.source_recon(src_codes, src_pp, train=train,
                                      valid=src_valid)

        tgt_code, per_point = self.encode_target(
            x, batch["tgt_sem"], train=train)

        part_f, part_mask, _ = part_segment_mean(per_point, labels, p_parts)
        param_def = part_aabb(x, labels, p_parts)

        recon_full = self.target_recon(tgt_code, per_point, train=train)
        re_residuals = self.retrieval_residuals(
            per_point, part_f, labels, train=train)

        params = self.decode_params(tgt_code, src_codes, per_point,
                                    train=train, part_mask=src_valid)

        deformed = get_shape(batch["src_mat"], params, param_def,
                             alpha=cfg.alpha)

        return {
            "src_codes": src_codes,
            "recon_src": recon_src,
            "tgt_code": tgt_code,
            "per_point": per_point,
            "part_f": part_f,
            "part_mask": part_mask,
            "param_def": param_def,
            "recon_full": recon_full,
            "re_residuals": re_residuals,
            "params": params,
            "deformed": deformed,
        }
