"""Typed configuration with reference-JSON compatibility.

The reference uses flat JSON dicts loaded with ``json.load`` and passed around
as ``cfg`` (reference ``engine/train.py:361-368``, ``config/*.json``).  We keep
the same key names so a reference config file loads unchanged, but give the
schema types, defaults, and validation.  Unknown keys are preserved in
``extras`` rather than silently dropped.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict


@dataclass
class URedConfig:
    # --- data (reference config_train_test.json) ---
    base_dir: str = "data"
    middle_name: str = ""
    src_connectivity: str = ""
    complementme: bool = False
    category: str = "chair"
    data_dir: str = "data_aabb_all_models"
    num_source: int = 500
    mode: str = "train"
    use_connectivity: bool = False

    # --- checkpoint init (reference engine/train.py:50-63,77-81) ---
    init_dm: bool = False
    init_re: bool = False
    dm_model_path: str = "nan"
    re_model_path: str = "nan"
    log_path: str = "workspace"

    # --- schedule ---
    device: str = "tpu"
    optimizer: str = "adam"
    epochs: int = 300
    save_epoch: int = 50
    batch_size: int = 16
    num_workers: int = 4
    input_channels: int = 3
    random_rot: bool = True

    # --- retrieval pseudo-labels (reference dataset/dataset_utils.py:1101-1143) ---
    cl_k: int = 40
    MAX_NUM_PARTS: int = 16
    filter_threshold: float = 2e-2
    # pooling/n_knn parameterize the VN encoder family (ref
    # network/VN/vn_encoder.py:12,31 reads cfg['n_knn']/cfg['pooling']);
    # consumed by models.vn.VNEncoder.from_config / VNRetrieval.from_config.
    pooling: str = "max"
    n_knn: int = 20

    # --- optimizer (reference train_utils/optimizer_dm.py:68-104) ---
    learning_rate: float = 1e-3
    lr_autodecoder: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    lr_stepsize: int = 3
    lr_decay: float = 0.5
    grad_clip: float = 5.0  # reference engine/train.py:339-344

    # --- deformation (reference engine/train.py:270, dataset_utils.py:691) ---
    alpha: float = 0.1

    # --- model dims (live config config_train_test.json:43-48) ---
    sem_latent_dim: int = 128
    source_latent_dim: int = 512
    target_latent_dim: int = 512
    part_latent_dim: int = 512
    num_semantic_classes: int = 42  # reference engine/global_variables.py:44

    # --- loss weights (reference engine/train.py:281-335) ---
    use_chamfer_loss: float = 30.0
    use_chamfer_part_loss: float = 1.0
    use_symmetry_loss: float = 30.0
    use_contrast_loss: float = 0.5
    use_param_loss: float = 0.0
    init_p_m_loss: int = -1
    # present in every reference config but consumed by no reference code
    # (grep: only config/*.json mention it); carried for file compatibility
    use_deformed_pc_consistency: float = 10.0
    use_residuals_reg: float = 3.0
    use_recon: float = 30.0

    # --- misc reference knobs ---
    # share_src_latent: dead in the reference too (config-only).  clip_vec
    # feeds the legacy Mahalanobis retrieval distance
    # (utils/retrieval_extras.py::compute_mahalanobis).
    share_src_latent: bool = False
    clip_vec: bool = False

    # --- geometry constants (reference engine/global_variables.py:34-35) ---
    num_target_points: int = 2048
    num_part_points: int = 1024

    # --- TPU-native additions (not in the reference schema) ---
    seed: int = 0
    mesh_dp: int = 1  # data-parallel axis size
    mesh_db: int = 1  # source-database-parallel axis size
    param_dtype: str = "float32"
    compute_dtype: str = "float32"

    extras: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "URedConfig":
        names = {f.name for f in dataclasses.fields(cls)} - {"extras"}
        known = {k: v for k, v in d.items() if k in names}
        extras = {k: v for k, v in d.items() if k not in names}
        cfg = cls(**known)
        cfg.extras = extras
        return cfg

    @classmethod
    def from_json(cls, path: str) -> "URedConfig":
        with open(path, "r") as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d.update(d.pop("extras"))
        return d

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def __post_init__(self) -> None:
        if self.MAX_NUM_PARTS <= 0:
            raise ValueError("MAX_NUM_PARTS must be positive")
        if self.num_target_points % 2:
            raise ValueError("num_target_points must be even")
