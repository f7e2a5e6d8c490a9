from .mesh import (
    batch_shardings,
    flows_shardings,
    make_mesh,
    make_sharded_train_step,
    params_shardings,
    shard_batch,
    shard_flows,
)

__all__ = [
    "batch_shardings",
    "flows_shardings",
    "make_mesh",
    "make_sharded_train_step",
    "params_shardings",
    "shard_batch",
    "shard_flows",
]
