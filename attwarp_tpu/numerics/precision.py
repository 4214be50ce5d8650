"""Float32-exact matmul helpers.

TPU matmuls default to bfloat16 operand precision. Every matmul on the
numerical-parity path (adaptive pooling, right-inverse upsampling, box
filtering, Lanczos resampling) must run at full float32, otherwise the
≤1e-3 pixel-parity budget is blown by ~5e-3 bf16 rounding. Training-path
matmuls (MarginalNet) intentionally do NOT use these helpers — bf16 is the
right choice there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def matmul_f32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum_f32(subscripts: str, *operands) -> jnp.ndarray:
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
