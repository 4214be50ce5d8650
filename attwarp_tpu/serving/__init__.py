"""Continuous-batching serving for the JAX MLLMs (TPU-native; the reference
has no serving path)."""

from attwarp_tpu.serving.chunked import ChunkedPrefillEngine
from attwarp_tpu.serving.disagg import DisaggServeEngine, split_meshes
from attwarp_tpu.serving.engine import Request, ServeEngine

__all__ = ["ChunkedPrefillEngine", "DisaggServeEngine", "Request",
           "ServeEngine", "split_meshes"]
