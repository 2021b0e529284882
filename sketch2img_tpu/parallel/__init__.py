from sketch2img_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_params", "shard_batch"]
