from scasml_gp_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
    train_point_sharding,
)
from scasml_gp_tpu.parallel.sharded import (
    make_sharded_picard_solve,
    make_sharded_train_and_solve,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
    "train_point_sharding",
    "make_sharded_picard_solve",
    "make_sharded_train_and_solve",
]
