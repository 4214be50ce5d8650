"""Device-mesh parallelism for batched warping and MarginalNet training."""

from attwarp_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_params,
)

__all__ = ["make_mesh", "shard_batch", "shard_params", "param_sharding_rules"]
