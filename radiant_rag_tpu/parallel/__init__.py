"""Mesh/topology layer: ICI/DCN scaling for the index engine and models.

The reference has no distributed capability at all (SURVEY.md §2.8: no
DP/TP/PP/SP/EP, no collectives; its only 'distribution' is TCP clients to one
Redis server, §5.8). Here the corpus dimension is sharded across chips and
per-shard top-k results merge with XLA collectives over ICI; model training
and inference shard batch (dp) and weights (tp) over the same mesh.
"""

from radiant_rag_tpu.parallel.mesh import create_mesh, mesh_info  # noqa: F401
from radiant_rag_tpu.parallel.sharded_index import ShardedFlatIndex  # noqa: F401
from radiant_rag_tpu.parallel.train import (  # noqa: F401
    contrastive_train_step, make_train_state, param_partition_specs,
)
