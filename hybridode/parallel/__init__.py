"""Device-mesh parallelism: 1-D batch DP + 2-D (patients x MC) eval."""

from .eval import evaluate_sharded, make_mesh_2d, make_sharded_eval_chunk
from .mesh import (
    batch_sharding,
    make_dp_eval_loss,
    make_dp_train_step,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_dp_eval_loss",
    "make_mesh_2d",
    "make_sharded_eval_chunk",
    "evaluate_sharded",
]
