"""Multi-chip batched warping.

Each warp is fully local to one image, so batch-dim sharding over the
``data`` mesh axis gives perfect scaling with ZERO cross-chip traffic inside
the kernel (SURVEY §5: "per-image warp fully local"). ``shard_map`` makes
that explicit — the compiled program contains no collectives at all.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from attwarp_tpu.warp.transforms import WarpParams
from attwarp_tpu.warp.warp import warp_batch_by_attention


def make_sharded_warp(
    mesh: Mesh,
    new_width: int,
    new_height: int,
    params: WarpParams = WarpParams(),
    method: str = "mm",
):
    """Returns a jitted function ``(images (B, H, W, C), atts (B, h, w)) ->
    warped (B, H_out, W_out, C)`` with the batch sharded over ``data``.

    ``B`` must be divisible by the data-axis size. Place inputs with
    ``attwarp_tpu.parallel.shard_batch`` (or let jit reshard them).
    """
    spec = P("data", None, None, None)
    att_spec = P("data", None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, att_spec),
        out_specs=spec,
    )
    def local_warp(images, atts):
        return warp_batch_by_attention.__wrapped__(
            images, atts, new_width, new_height, params, method
        )

    return jax.jit(local_warp)
