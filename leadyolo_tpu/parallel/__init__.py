from .mesh import (
    DATA_AXIS,
    batch_sharding,
    is_main_process,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
