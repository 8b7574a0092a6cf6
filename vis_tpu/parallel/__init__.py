from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh
from vis_tpu.parallel.sharding import (
    kv_cache_sharding,
    shard_decoder_params,
    shard_stacked_decoder_params,
    shard_qwen2vl_params,
    shard_vision_params,
)

__all__ = [
    "create_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "shard_decoder_params",
    "shard_stacked_decoder_params",
    "shard_vision_params",
    "shard_qwen2vl_params",
    "kv_cache_sharding",
]
