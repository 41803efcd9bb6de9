"""U-RED-TPU: TPU-native unsupervised 3D shape retrieval and deformation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch implementation of U-RED (Di et al., ICCV 2023): part-level retrieval
from a source-shape database, residual-guided retrieval ranking, and
graph-attention box-deformation of retrieved parts to fit full or partial
target point clouds, trained end-to-end from DCD-derived pseudo-labels.

Layout (mirrors the reference layer map, SURVEY.md section 1):
  ops/       Geometry + kernel layer (chamfer/DCD/EMD/kNN/FPS, deformation
             forward) — replaces the reference CUDA extensions.
  models/    Flax modules: encoders, graph-attention deformation decoder,
             residual nets, VN / GCN3D / PointNet encoder zoo, completion.
  losses/    Masked pure-function losses (chamfer, contrast, recon, ...).
  data/      Offline preprocessing, occlusion synthesis, datasets.
  parallel/  Mesh setup, sharded train/eval steps, source-DB sharding.
  engine/    Entry points: train / evaluate / retrieval, checkpointing.
  utils/     Config-adjacent helpers, logging, rotations.
"""

__version__ = "0.1.0"
