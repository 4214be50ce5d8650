"""Adaptive average pooling and its minimum-norm right inverse.

The reference relies on ``torch.nn.functional.adaptive_avg_pool1d/2d``
(trainer.py:197,433; losses.py:57-58,72) and on
``upsample_pdf_right_inverse`` (checkpoint_utils.py:64-131), which solves
``x_hat = A^T (A A^T + eps I)^{-1} y`` for the pooling operator ``A``.

TPU-native design: both the pooling and the right inverse are expressed as
precomputed constant matrices applied with a single matmul (MXU-friendly,
fully static shapes). The matrices depend only on ``(L_out, L_in)`` and are
cached on the host; the linear solve happens once in float64 on the host,
never inside jit.

PyTorch's AdaptiveAvgPool1d window rule (replicated exactly):
    start_i = floor(i * L_in / L_out)
    end_i   = ceil((i + 1) * L_in / L_out)
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from attwarp_tpu.numerics.precision import einsum_f32, matmul_f32


@lru_cache(maxsize=256)
def _pool_matrix_np(out_len: int, in_len: int) -> np.ndarray:
    """(out_len, in_len) adaptive-average-pooling matrix, float64 host-side."""
    i = np.arange(out_len, dtype=np.int64)
    starts = (i * in_len) // out_len
    ends = ((i + 1) * in_len + out_len - 1) // out_len  # integer ceil
    A = np.zeros((out_len, in_len), dtype=np.float64)
    for k in range(out_len):
        s, e = int(starts[k]), int(ends[k])
        A[k, s:e] = 1.0 / max(e - s, 1)
    return A


@lru_cache(maxsize=256)
def _right_inverse_matrix_np(out_len: int, in_len: int, eps: float) -> np.ndarray:
    """(in_len, out_len) minimum-norm right inverse ``A^T (A A^T + eps I)^{-1}``."""
    A = _pool_matrix_np(out_len, in_len)
    AAT = A @ A.T
    if eps > 0:
        AAT = AAT + eps * np.eye(out_len, dtype=np.float64)
    # x_hat = A^T (AAT)^{-1} y  =>  M = A^T (AAT)^{-1}
    M = A.T @ np.linalg.solve(AAT, np.eye(out_len, dtype=np.float64))
    return M


def adaptive_pool_matrix(out_len: int, in_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Constant pooling matrix usable inside jit (treated as a literal)."""
    return jnp.asarray(_pool_matrix_np(out_len, in_len), dtype=dtype)


def right_inverse_matrix(
    out_len: int, in_len: int, eps: float = 1e-8, dtype=jnp.float32
) -> jnp.ndarray:
    """Constant right-inverse matrix (in_len, out_len) usable inside jit."""
    return jnp.asarray(_right_inverse_matrix_np(out_len, in_len, float(eps)), dtype=dtype)


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """``(..., L_in) -> (..., out_len)`` adaptive average pooling (one matmul)."""
    in_len = x.shape[-1]
    if in_len == out_len:
        return x
    P = adaptive_pool_matrix(out_len, in_len, dtype=x.dtype)
    return matmul_f32(x, P.T)


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """``(..., H, W) -> (..., out_h, out_w)``; separable: ``Py @ x @ Px^T``."""
    out_h, out_w = out_hw
    H, W = x.shape[-2], x.shape[-1]
    if (H, W) == (out_h, out_w):
        return x
    Py = adaptive_pool_matrix(out_h, H, dtype=x.dtype)
    Px = adaptive_pool_matrix(out_w, W, dtype=x.dtype)
    return einsum_f32("ih,...hw,jw->...ij", Py, x, Px)


def upsample_pdf_right_inverse(
    y: jnp.ndarray, target_len: int, eps: float = 1e-8
) -> jnp.ndarray:
    """Right-inverse upsampling for adaptive average pooling.

    Given ``y: (..., L_out)`` produced (conceptually) by
    ``adaptive_avg_pool1d(x, L_out)`` from some ``x`` of length ``target_len``,
    return the minimum-norm ``x_hat: (..., target_len)`` such that pooling it
    back reproduces ``y`` up to FP tolerance
    (reference checkpoint_utils.py:64-131; contract documented at :70-83).

    The reference solves a linear system per call; here the solve collapses to
    a cached constant matrix and a single MXU matmul.
    """
    out_len = y.shape[-1]
    M = right_inverse_matrix(out_len, int(target_len), eps, dtype=jnp.float32)
    return matmul_f32(y.astype(jnp.float32), M.T)
