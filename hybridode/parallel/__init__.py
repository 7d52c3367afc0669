"""Device-mesh data parallelism."""

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
]
