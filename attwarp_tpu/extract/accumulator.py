"""Scan-carried attention accumulation.

Semantics parity with ``MaskHookLogger`` / ``BatchMaskHookLogger``
(attention_extraction/llava.py:93-132, 384-411):

per step:  row = attn[:, heads, -1, st:ed]            (post-softmax)
           row = row / (row.sum(-1, keepdims) + 1e-12) (re-normalize slice)
           row = row.mean(heads)
finalize:  mean over accumulated steps; uniform 1/576 if no steps.

The carry is a (sum, count) pair per sample, so steps where a sample is
already finished can be excluded by passing ``active=0`` — the functional
equivalent of generation having stopped for that sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NUM_IMAGE_TOKENS = 576  # 24x24 patches for LLaVA-1.5 (llava.py:50)


class AttnCarry(NamedTuple):
    total: jnp.ndarray  # (B, num_image_tokens) running sum of per-step rows
    count: jnp.ndarray  # (B,) number of accumulated steps


def init_carry(batch: int, num_image_tokens: int = NUM_IMAGE_TOKENS) -> AttnCarry:
    return AttnCarry(
        total=jnp.zeros((batch, num_image_tokens), jnp.float32),
        count=jnp.zeros((batch,), jnp.float32),
    )


def slice_and_pool_attention(
    attn_probs: jnp.ndarray,   # (B, H, kv_len) post-softmax row of the current token
    img_start: jnp.ndarray,    # (B,) int32 per-sample image-token start
    num_image_tokens: int = NUM_IMAGE_TOKENS,
) -> jnp.ndarray:
    """Per-sample slice [st, st+576), renormalize, mean over heads -> (B, 576).

    The per-sample start varies under left padding (llava.py:364-369), so the
    slice is a masked gather expressed with an iota comparison — static
    shapes, vmap-safe.
    """
    B, H, kv = attn_probs.shape
    pos = jnp.arange(num_image_tokens, dtype=jnp.int32)[None, :]  # (1, 576)
    idx = img_start[:, None] + pos                                 # (B, 576)
    valid = idx < kv
    idx = jnp.clip(idx, 0, kv - 1)
    # gather per sample along kv axis
    rows = jnp.take_along_axis(
        attn_probs, idx[:, None, :].repeat(H, axis=1), axis=-1
    )  # (B, H, 576)
    rows = jnp.where(valid[:, None, :], rows, 0.0)
    rows = rows / (jnp.sum(rows, axis=-1, keepdims=True) + 1e-12)
    return jnp.mean(rows, axis=1)  # (B, 576)


def accumulate_step(
    carry: AttnCarry,
    attn_probs: jnp.ndarray,  # (B, H, kv_len)
    img_start: jnp.ndarray,   # (B,)
    active: jnp.ndarray,      # (B,) 1.0 while the sample is still generating
    num_image_tokens: int = NUM_IMAGE_TOKENS,
) -> AttnCarry:
    row = slice_and_pool_attention(attn_probs, img_start, num_image_tokens)
    act = active.astype(jnp.float32)
    return AttnCarry(
        total=carry.total + row * act[:, None],
        count=carry.count + act,
    )


def finalize(carry: AttnCarry, side: int = 24, side_w: int | None = None) -> jnp.ndarray:
    """Mean over steps -> (B, side, side_w or side); uniform fallback when no
    step was accumulated (llava.py:126-128, 404-408). ``side_w`` supports
    rectangular grids (Qwen2-VL on non-square images)."""
    n = carry.total.shape[-1]
    uniform = jnp.full_like(carry.total, 1.0 / n)
    mean = carry.total / jnp.clip(carry.count[:, None], 1.0, None)
    out = jnp.where(carry.count[:, None] > 0, mean, uniform)
    return out.reshape(out.shape[0], side, side_w if side_w is not None else side)
