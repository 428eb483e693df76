from bubbleformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    is_leader,
    make_mesh,
    replicated,
)
from bubbleformer_tpu.parallel.sharding import (
    infer_param_shardings,
    param_partition_spec,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "is_leader",
    "make_mesh",
    "replicated",
    "infer_param_shardings",
    "param_partition_spec",
    "shard_params",
]
