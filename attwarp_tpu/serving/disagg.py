"""Disaggregated prefill/decode serving over two device groups.

WHY. The single-chip engine is ADMISSION-bound at its measured optimum
(ARCHITECTURE.md: 32 slots, 684.3 tok/s aggregate ≈ 99% of the serialized
decode+prefill ideal — the chip spends ~half the wall clock running
640-token admission prefills that stall the decode slot pool). The classic
fix is disaggregation (the reference has no serving at all; this mirrors
production TPU/GPU serving systems): give admission prefill its OWN device
group so prefill compute and decode compute overlap in wall-clock time,
and ship only the finished KV block across.

HOW (TPU-native). Two `jax.sharding.Mesh` groups over disjoint devices.
The decode group holds the slot pool, its KV cache, and one copy of the
weights; the prefill group holds a second weight copy (the standard
disagg trade: weights are duplicated, cache is not). Admission calls jit
programs whose operands live on the prefill group, so XLA launches them
there; the chunked decode step's operands live on the decode group. JAX
dispatch is asynchronous per device, so the two programs execute
concurrently on real hardware — the host thread never waits on the
prefill before dispatching the next decode tick (the base engine's
non-blocking admission already defers the first-token fetch). The KV
block crosses groups with one `jax.device_put` (ICI transfer on real
TPUs; the insert consumes it on the decode side).

Under the driver's virtual CPU mesh the two "groups" share host cores, so
this validates program structure and token parity, not wall-clock overlap
— the overlap claim is structural (disjoint device sets, async dispatch).

Token parity: disaggregation changes WHERE the prefill runs, not its
math — tests pin DisaggServeEngine's tokens against the single-group
engine and per-request generate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from attwarp_tpu.serving.engine import ServeEngine


def split_meshes(
    devices: Optional[Sequence] = None,
    prefill_devices: int = 0,
    model_axis: int = 1,
) -> tuple:
    """Split the available devices into (decode_mesh, prefill_mesh).

    ``prefill_devices`` defaults to half. Each group is a (data, model)
    mesh so the existing TP param shardings apply within a group."""
    devs = list(devices if devices is not None else jax.devices())
    n_p = prefill_devices or len(devs) // 2
    assert 0 < n_p < len(devs), (n_p, len(devs))
    p_devs, d_devs = devs[:n_p], devs[n_p:]

    def mk(group):
        n_model = model_axis if len(group) % model_axis == 0 else 1
        arr = np.asarray(group).reshape(len(group) // n_model, n_model)
        return Mesh(arr, axis_names=("data", "model"))

    return mk(d_devs), mk(p_devs)


def _replicated(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


class DisaggServeEngine(ServeEngine):
    """`ServeEngine` whose admission prefills run on a separate device
    group. ``model`` (and the slot-pool cache the base class allocates
    from it) lives on the decode group; ``prefill_model`` is a second
    instance of the same weights placed/sharded on the prefill group.

    >>> d_mesh, p_mesh = split_meshes()
    >>> eng = DisaggServeEngine(model_d, prefill_model=model_p,
    ...                         decode_mesh=d_mesh, prefill_mesh=p_mesh,
    ...                         slots=32, max_seq=832, kv_quant=True)
    """

    def __init__(self, model, prefill_model, decode_mesh: Mesh,
                 prefill_mesh: Mesh, **kw):
        super().__init__(model, **kw)
        self.prefill_model = prefill_model
        self.decode_mesh = decode_mesh
        self.prefill_mesh = prefill_mesh
        # the base class allocated the cache wherever the default device
        # put it — pin it (and the decode model's params' consumers) to
        # the decode group so decode programs launch there
        self.kv = _replicated(self.kv, decode_mesh)
        self._to_decode = NamedSharding(decode_mesh, P())
        self._to_prefill = NamedSharding(prefill_mesh, P())

    # ── the two admission hooks run on the prefill group ────────────────
    def _run_prefill(self, ids, mask, pixels, Tb, with_image):
        from attwarp_tpu.serving.engine import _prefill

        put = lambda x: jax.device_put(x, self._to_prefill)
        firsts, block = _prefill(
            self.prefill_model.params, self.cfg, self.tcfg,
            put(ids), put(mask), put(pixels), Tb,
            self.kv_quant, with_image, self.use_flash,
        )
        # one cross-group transfer per admission: the finished KV block
        # (ICI on real TPUs). firsts stay on the prefill group — they are
        # only fetched to host, batched per admission wave.
        return firsts, jax.device_put(block, self._to_decode)

    def _run_qwen_prefill(self, ids, mask, patches, pos, grid, Tb):
        from attwarp_tpu.serving.engine import _qwen_prefill

        put = lambda x: jax.device_put(x, self._to_prefill)
        first, block = _qwen_prefill(
            self.prefill_model.params, self.cfg, self.tcfg,
            put(ids), put(mask), put(patches), put(pos), grid, Tb,
            self.kv_quant, self.use_flash,
        )
        return first, jax.device_put(block, self._to_decode)
