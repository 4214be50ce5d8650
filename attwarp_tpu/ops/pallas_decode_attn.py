"""Pallas decode-attention kernel over the int8 KV cache.

WHY. Single-token decode attention against the quantized cache is the term
that collapses at batch (ARCHITECTURE.md "int8 KV cache"): the XLA forms
achieve ~180-370 GiB/s on the int8 cache bytes — well under the 819 GB/s
v5e HBM roofline — because the int8 element loads plus the per-(token,
head) f32 scale multiply vectorize poorly, and every "fix" expressible in
XLA (explicit dequant, native s8xs8->s32 dot_general, head-major layout)
materializes a wider intermediate in HBM and measures worse
(tools/bench_attn_forms.py). The cache read is the whole cost — at 7B
geometry the arithmetic is ~2 flops/byte — so the winning move is a kernel
that streams the int8 bytes from HBM exactly once and does ALL widening,
scaling, softmax, and the PV reduction on-chip.

THREE LESSONS FROM THE V1 KERNEL (kept here so they are not re-learned):
1. A custom call cannot fuse its operands. Passing ``k_q[i]`` (a slice)
   materializes a per-layer copy of the cache plane; passing the whole
   cache behind a ``(kvH, hd) -> kvH*hd`` reshape is worse — on TPU tiled
   layouts that reshape is a real relayout, so XLA copied the ENTIRE
   cache per layer per step (189 ms/step at B=8, 9x over no-kernel). The
   kernel must take the cache in its NATIVE 5D layout and collapse
   (Sb, kvH, hd) -> (Sb*kvH, hd) inside (minor dim untouched — free).
2. Reading the POST-update cache poisons the in-place dynamic-update-slice
   chain: the custom-call read of the updated buffer forces copy-on-write.
   So the kernel reads the STEP-ENTRY (stale) cache — every layer reads
   the same ``kv0`` arrays, all reads precede all writes, and the caller
   appends every layer's new K/V with ONE batched dynamic_update_slice at
   the end of the step. The current token's contribution is merged outside
   the kernel with a standard two-way online-softmax merge (the kernel
   returns unnormalized acc plus its running max/sum).
3. Per-(token, head) scales live in the cache as (L, B, S, kvH) — kvH on
   lanes, padded 32->128. The kernel's score layout is (H, Sb*kvH), so the
   scales are pre-flattened ONCE per step to (L, B, 1, S*kvH) (a single
   46 MiB relayout, CSE'd across the 32 per-layer calls because every call
   passes the same kv0 value) instead of being relayed out in-kernel.

SHAPE OF THE KERNEL. Flash-decoding: grid (B, S/Sb), S sequential, online-
softmax running stats in VMEM scratch. Per step one (Sb, kvH, hd) int8 K
tile and V tile stream in as native 5D blocks (one linear HBM burst). All
H query heads run in ONE matmul pair per tile:

  scores (H, Sb*kvH)  = q (H, hd) . K2^T          (K2 = int8->bf16 tile)
  pv     (H, hd)      = (p * v_scales) . V2

where row h of ``scores`` only keeps columns r with r % kvH == h // n_rep
(an iota comparison selects each head's kv group; the off-group entries
are dense-matmul waste, ~free next to the int8 stream, and buy zero
in-kernel transposes/relayouts of the big operands). Softmax stats live in
(H, 1) layout so every reduction is a lane reduction, the only class
Mosaic lowers. GQA needs no rep loop at all — the group structure is in
the selection mask.

Numerics match ``_attn_quantcache``: q.k products in bf16 (exactly the XLA
form's einsum dtype) with f32 accumulation, softmax in f32, and the
current token is merged from its quantize->dequantize round trip (the
same values the XLA ladder reads back from the cache) — inside the decode
contract (cos > 0.999 vs the dense cache; greedy tokens match).

This replaces the reference's torch.scaled_dot_product_attention decode
read (vendored modeling_llama.py) — the reference has no quantized cache
at all; this kernel is what makes one pay off at batch.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(np.finfo(np.float32).max)


def _backend_on() -> bool:
    """Mosaic kernels can't execute on the CPU backend except under the
    (slow) interpreter, so the decode steps' form ladder only routes here
    off-CPU. ATTWARP_PALLAS_DECODE=1 forces it on (CPU tests wrap the
    computation in ``force_tpu_interpret_mode``); =0 forces it off."""
    env = os.environ.get("ATTWARP_PALLAS_DECODE", "auto")
    if env != "auto":
        return env not in ("0", "off", "false")
    return jax.default_backend() != "cpu"


_TILE_TARGET_BYTES = 2 * 2**20   # ~2 MB of int8 K+V per grid step


def _seq_tile(S: int, kvH: int = 32, hd: int = 128) -> int:
    """Largest divisor of S that is a multiple of 32 (the int8 sublane
    tile), capped so one grid step's K+V int8 tile is ~_TILE_TARGET_BYTES.

    The cap is kvH-aware (round 4): at LLaVA geometry (kvH 32) it lands on
    the old fixed 256, but Qwen2-VL's GQA cache (kvH 4) under a 256 cap
    streamed only 180 KB per grid step — DMAs too small to hide their
    issue cost, leaving the measured per-row efficiency at 44% of roofline
    at B=64. With the byte-target cap the token tile grows 8x at kvH=4
    (typically the whole 704-slot sequence in one step). Returns 0 if no
    multiple-of-32 divisor exists."""
    cap_tokens = _TILE_TARGET_BYTES // (2 * kvH * hd)
    cap = max(32, min(cap_tokens, 2048)) // 32 * 32
    for b in range(min(cap, S) // 32 * 32, 31, -32):
        if S % b == 0:
            return b
    return 0


def decode_attn_supported(S: int, kv_heads: int, head_dim: int,
                          batch: int) -> bool:
    """Static gate: S must carry a multiple-of-32 divisor (any 64-multiple
    qualifies; quantized caches are allocated as 64-multiples everywhere in
    this repo for exactly this reason) and head_dim one lane register. No
    batch bound: the v2 kernel's effective bandwidth scales monotonically
    (273/413/473/507 GiB/s at B=8/16/24/32 S=672,
    tools/bench_attn_forms.py) — the v1 B>=24 collapse was an artifact of
    its per-rep (n_rep*kvH, kvH*hd) accumulator traffic, gone in v2."""
    return head_dim == 128 and _seq_tile(S, kv_heads, head_dim) != 0 \
        and _backend_on()


def _kernel(q_ref, kq_ref, ksx_ref, vq_ref, vsx_ref, bias_ref,
            acc_out, m_out, l_out, m_s, l_s, acc_s,
            *, n_rep: int, kvH: int, hd: int, H: int,
            sm_scale: float, n_steps: int):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    Sb = kq_ref.shape[2]
    R = Sb * kvH
    # native 5D tile; collapsing (Sb, kvH) with hd untouched is layout-free
    K2 = kq_ref[0, 0].reshape(R, hd).astype(jnp.bfloat16)
    V2 = vq_ref[0, 0].reshape(R, hd).astype(jnp.bfloat16)
    qh = q_ref[0]                                        # (H, hd) bf16
    s0 = jax.lax.dot_general(
        qh, K2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (H, R)
    ksx = ksx_ref[0, 0]                                  # (1, R)
    bias = bias_ref[0]                                   # (1, R)
    # row h keeps columns r with r % kvH == h // n_rep (its kv group)
    r_grp = jax.lax.broadcasted_iota(jnp.int32, (H, R), 1) % kvH
    h_grp = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0) // n_rep
    s = jnp.where(r_grp == h_grp, s0 * ksx * sm_scale + bias, _NEG)
    m_old = m_s[...]                                     # (H, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(s - m_new)                               # (H, R)
    m_s[...] = m_new
    l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pw = (p * vsx_ref[0, 0]).astype(jnp.bfloat16)        # (H, R)
    pv = jax.lax.dot_general(
        pw, V2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (H, hd)
    acc_s[...] = acc_s[...] * alpha + pv

    @pl.when(step == n_steps - 1)
    def _finish():
        acc_out[0] = acc_s[...]
        m_out[0] = m_s[...]
        l_out[0] = l_s[...]


def prepare_decode_attn_operands(k_s, v_s, mask):
    """Per-STEP operand prep, hoisted out of the per-layer kernel calls so
    the relayouts happen once: the per-(token, head) scales flattened to
    the kernel's (1, S*kvH) row layout and the strict-prefix mask expanded
    to an additive bias in the same layout.

    k_s/v_s: (L, B, S, kvH) f32 — the STEP-ENTRY cache scales.
    mask: (B, S) bool — valid slots EXCLUDING the current token's."""
    L, B, S, kvH = k_s.shape
    ksx = k_s.reshape(L, B, 1, S * kvH)
    vsx = v_s.reshape(L, B, 1, S * kvH)
    bias = jnp.where(mask, 0.0, _NEG).astype(jnp.float32)
    bias = jnp.repeat(bias, kvH, axis=1)[:, None, :]     # (B, 1, S*kvH)
    return ksx, vsx, bias


@partial(jax.jit, static_argnames=("num_heads", "sm_scale", "layer",
                                   "interpret", "seq_tile"))
def decode_attn_quantcache(
    q: jnp.ndarray,        # (B, 1, H, hd) any float dtype
    k_q: jnp.ndarray,      # (L, B, S, kvH, hd) int8 — STEP-ENTRY cache
    ksx: jnp.ndarray,      # (L, B, 1, S*kvH) f32 — from prepare_...
    v_q: jnp.ndarray,
    vsx: jnp.ndarray,
    bias: jnp.ndarray,     # (B, 1, S*kvH) f32 — from prepare_...
    k1_q: jnp.ndarray,     # (B, 1, kvH, hd) int8 — this step's new K
    k1_s: jnp.ndarray,     # (B, 1, kvH) f32
    v1_q: jnp.ndarray,
    v1_s: jnp.ndarray,
    *,
    num_heads: int,
    sm_scale: float,
    layer: int = 0,
    interpret: bool = False,
    seq_tile: int = 0,
) -> jnp.ndarray:
    """Single-token attention against the int8 cache; returns (B, 1, H*hd)
    in q's dtype. HBM traffic: the int8 cache once, nothing widened.

    Pass the WHOLE step-entry cache with ``layer=i`` (selected by the
    BlockSpec index maps) and the current token's quantized K/V separately;
    append the token to the cache AFTER the last kernel read (one batched
    dynamic_update_slice per step) — see the module docstring's lessons."""
    L, B, S, kvH, hd = k_q.shape
    H = num_heads
    n_rep = H // kvH
    Sb = seq_tile or _seq_tile(S, kvH, hd)
    assert S % Sb == 0 and Sb % 32 == 0, (S, Sb)
    n_steps = S // Sb
    qh = q[:, 0].astype(jnp.bfloat16)                    # (B, H, hd)
    li = layer
    acc, m, l = pl.pallas_call(
        partial(_kernel, n_rep=n_rep, kvH=kvH, hd=hd, H=H,
                sm_scale=sm_scale, n_steps=n_steps),
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb, kvH, hd), lambda b, s: (li, b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Sb * kvH), lambda b, s: (li, b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb, kvH, hd), lambda b, s: (li, b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Sb * kvH), lambda b, s: (li, b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sb * kvH), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),             # running max
            pltpu.VMEM((H, 1), jnp.float32),             # running sum
            pltpu.VMEM((H, hd), jnp.float32),            # weighted V
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * kvH * hd * H * 2,
            bytes_accessed=B * (2 * S * kvH * hd + 2 * S * kvH * 4),
            transcendentals=B * S * kvH * H,
        ),
        interpret=interpret,
    )(qh, k_q, ksx, v_q, vsx, bias)
    # merge the current token from its quantize->dequantize round trip —
    # the exact values the XLA ladder reads back from the cache
    k1 = (k1_q.astype(jnp.float32) * k1_s[..., None])[:, 0]   # (B, kvH, hd)
    v1 = (v1_q.astype(jnp.float32) * v1_s[..., None])[:, 0]
    k1r = jnp.repeat(k1.astype(jnp.bfloat16), n_rep, axis=1)  # (B, H, hd)
    v1r = jnp.repeat(v1, n_rep, axis=1)
    s_new = jnp.einsum(
        "bhd,bhd->bh", qh, k1r, preferred_element_type=jnp.float32,
    ) * sm_scale                                              # (B, H)
    m0, l0 = m[..., 0], l[..., 0]                             # (B, H)
    m_tot = jnp.maximum(m0, s_new)
    a_k = jnp.exp(m0 - m_tot)
    a_n = jnp.exp(s_new - m_tot)
    out = (acc * a_k[..., None] + a_n[..., None] * v1r) / (
        l0 * a_k + a_n)[..., None]
    return out.reshape(B, 1, H * hd).astype(q.dtype)
