"""Device-mesh parallelism for batched warping and MarginalNet training."""

from attwarp_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)
from attwarp_tpu.parallel.sp_prefill import sp_prefill, sp_prefill_qwen
from attwarp_tpu.parallel.warp_sharded import make_sharded_warp
from attwarp_tpu.parallel.llava_sharding import (
    llava_param_specs,
    qwen2vl_param_specs,
    shard_llava_params,
    shard_qwen2vl_params,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_params",
    "param_sharding_rules",
    "make_sharded_warp",
    "sp_prefill",
    "sp_prefill_qwen",
    "llava_param_specs",
    "shard_llava_params",
    "qwen2vl_param_specs",
    "shard_qwen2vl_params",
]
