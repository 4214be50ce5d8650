"""Numerically-guarded probability helpers.

Matches the reference ``model/marginalnet_full_dataset/model.py``:
``safe_softmax`` (model.py:8-14), ``mix_with_uniform`` (model.py:98-101),
``entropy`` (model.py:104-106).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_softmax(logits: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    """Softmax with NaN/Inf scrubbing and post-hoc renormalization."""
    logits = jnp.nan_to_num(logits, nan=0.0, posinf=0.0, neginf=0.0)
    logits = logits - jnp.max(logits, axis=axis, keepdims=True)
    p = jax.nn.softmax(logits, axis=axis)
    p = jnp.nan_to_num(p, nan=0.0, posinf=0.0, neginf=0.0)
    return p / jnp.clip(jnp.sum(p, axis=axis, keepdims=True), eps, None)


def mix_with_uniform(p: jnp.ndarray, alpha) -> jnp.ndarray:
    """Convexly mix a batched PDF ``(B, N)`` with the uniform distribution.

    ``alpha`` may be a traced scalar (the training schedule anneals it), so
    unlike the reference we do not branch on it in Python.
    """
    n = p.shape[-1]
    alpha = jnp.asarray(alpha, dtype=p.dtype)
    alpha = jnp.clip(alpha, 0.0, 1.0)
    return (1.0 - alpha) * p + alpha / n


def entropy(p: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Mean Shannon entropy over the batch of PDFs ``(B, N)``."""
    q = jnp.clip(p, eps, None)
    return jnp.mean(-jnp.sum(q * jnp.log(q), axis=-1))


def normalize_pdf(p: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Clamp to >= 0 and renormalize along the last axis."""
    p = jnp.clip(p, 0.0, None)
    return p / jnp.clip(jnp.sum(p, axis=-1, keepdims=True), eps, None)
