"""Parallelism layer: device meshes, sharded train/eval, DB-sharded retrieval.

The reference's only distributed machinery is NCCL DDP hooks (SURVEY.md
§2.8); here parallelism is SPMD over a ``jax.sharding.Mesh`` with two axes:

  dp — data parallel over the batch (gradients ``psum``; contrastive
       negatives ``all_gather`` — replacing ``loss/contrast_loss.py:35-58``).
  db — source-database parallel for retrieval/eval at scale: the S-axis of
       the source DB is sharded, each device scores its shard and the top-k
       are merged (SURVEY.md §5 "long-context" note: the long axis here is
       the source database, not sequence length).
"""

from ured_tpu.parallel.mesh import make_mesh, resolve_mesh
from ured_tpu.parallel.retrieval import (
    encode_source_db,
    pad_to_multiple,
    retrieve_topk,
    sharded_retrieve_topk,
)
from ured_tpu.parallel.sharded import (
    make_sharded_train_step,
    shard_batch_specs,
)
