"""Mesh construction and sharding rules.

The reference has no distributed machinery at all (SURVEY §2: no
torch.distributed, no NCCL/MPI). The TPU-native scaling story is:

- **Data parallelism** over the ``data`` mesh axis: the batch dimension of
  images/attention/feature tensors is sharded; each warp is fully local so
  the batched warp has ZERO cross-chip traffic; gradient all-reduce for
  training is the ``psum`` XLA inserts from the sharding annotations.
- **Tensor parallelism** over the ``model`` axis: MarginalNet's hidden
  (channel) dimension is sharded on the weight matrices; XLA inserts the
  all-gather/reduce-scatter collectives over ICI.

Everything goes through ``jax.jit`` with ``NamedSharding`` annotations — no
hand-written collectives are needed at this model scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a 2-D ``(data, model)`` mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    assert n_data * n_model == len(devs), (
        f"mesh {n_data}x{n_model} != {len(devs)} devices"
    )
    arr = np.asarray(devs).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(tree, mesh: Mesh):
    """Place every array in ``tree`` with its leading (batch) dim sharded on
    the ``data`` axis, everything else replicated."""

    def place(x):
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def param_sharding_rules(path: str, shape) -> P:
    """Tensor-parallel partition rule for MarginalNet parameters.

    Shards the channel-bearing axis of large kernels on the ``model`` axis:
    - conv/dense kernels: output-channel (last) axis
    - biases and small params: replicated
    """
    if len(shape) >= 2 and shape[-1] >= 128:
        return P(*([None] * (len(shape) - 1)), "model")
    return P(*([None] * len(shape)))


def shard_params(params, mesh: Mesh):
    """Apply ``param_sharding_rules`` over a flax param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    placed = []
    for path, leaf in flat:
        name = "/".join(str(p) for p in path)
        spec = param_sharding_rules(name, leaf.shape)
        # only shard if the axis divides evenly over the model dimension
        n_model = mesh.shape["model"]
        if "model" in (spec or ()) and leaf.shape[-1] % n_model != 0:
            spec = P(*([None] * leaf.ndim))
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)


def param_shardings(params, mesh: Mesh):
    """NamedShardings (not placements) for use as jit in/out shardings."""

    def one(path, leaf):
        name = "/".join(str(p) for p in path)
        spec = param_sharding_rules(name, leaf.shape)
        n_model = mesh.shape["model"]
        if "model" in (spec or ()) and leaf.shape[-1] % n_model != 0:
            spec = P(*([None] * leaf.ndim))
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_shardings(tree, mesh: Mesh):
    def one(x):
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(one, tree)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
