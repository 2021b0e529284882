from sketch2img_tpu.parallel.tp import tp_param_specs, shard_params_tp
from sketch2img_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    shard_batch,
    initialize_distributed,
    sync_global_devices,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "shard_batch",
    "initialize_distributed",
    "sync_global_devices",
    "tp_param_specs",
    "shard_params_tp",
]
