"""Masked pure-function losses (reference ``loss/`` directory).

Every loss is a pure function over fixed-shape masked tensors; the
reference's per-sample / per-part python loops (e.g.
``loss/chamfer_loss.py:13-27``, ``loss/basic_loss.py:255-261``) become single
batched masked reductions, so the whole loss stack lives inside one jitted
train step.
"""

from ured_tpu.losses.losses import (
    assembly_chamfer_loss,
    contrastive_loss,
    pc_consistency,
    pc_consistency_weighted,
    regularization_param,
    regularization_residuals,
    residual_retrieval_loss,
    symmetry_loss,
)
