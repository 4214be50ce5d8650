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
   the end of the step. The current token's contribution is a standard
   two-way online-softmax merge — in-kernel since v3 (the token's
   quantized K/V are passed as tiny extra operands; v2 merged in XLA and
   paid 3-4 small fusions per layer of dispatch).
3. Per-(token, head) scales live in the cache as (L, B, S, kvH) — kvH on
   lanes, padded 32->128. The kernel's score layout is (H, Sb*kvH), so the
   scales are pre-flattened ONCE per step to (L, B, 1, S*kvH) (a single
   46 MiB relayout, CSE'd across the 32 per-layer calls because every call
   passes the same kv0 value) instead of being relayed out in-kernel.

SHAPE OF THE KERNEL (v3). Flash-decoding: grid (B/Bb, S/Sb), S sequential,
online-softmax running stats in VMEM scratch; ``_tile_plan`` picks (Sb, Bb)
to minimize grid invocations under the VMEM tile budget (the v2 grid fixed
Bb=1 and capped Sb at a 2 MB DMA target — 352 invocations/call at LLaVA
max_seq 704, most of the measured ~95 us fixed per-call cost). The current
token's online-softmax merge and the final normalization run in the finish
branch IN-KERNEL (v2 did them in XLA: 3-4 extra fusions per layer). Per
grid step, Bb (Sb, kvH, hd) int8 K tiles and V tiles stream in as native
5D blocks (one linear HBM burst each). All H query heads run in ONE matmul
pair per tile and row:

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
current token is merged from its quantized values (q·k1_q in bf16 — the
int8 payload is exact in bf16 — then scaled in f32, slightly MORE precise
than v2's dequantize-then-round-trip) — inside the decode contract
(cos > 0.999 vs the dense cache; greedy tokens match).

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

# VMEM budget for the double-buffered input tiles (K, V, their scale rows
# and the bias row): ~16 MB/core total on v5e, minus q/out blocks, the
# (Bb*H, hd) f32 accumulator scratch, and compiler slack. Every input
# BlockSpec is double-buffered, so tiles cost 2*(2*K + 3*K/32) ≈ 4.2*K.
_VMEM_TILE_BUDGET = 10 * 2**20


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


def _tile_plan(S: int, kvH: int, hd: int, B: int):
    """Joint (seq_tile, batch_block) choice: minimize grid invocations
    subject to the double-buffered VMEM tile budget.

    The v2 kernel fixed its grid at (B, S/Sb) with Sb capped by a per-DMA
    byte target; at the serving geometries that leaves the per-call fixed
    cost dominated by grid-invocation count — LLaVA B=32 at max_seq 704
    ran 32×11 = 352 invocations (Sb stuck at 64: 704's only 32-multiple
    divisors are 32/64/352/704 and 352 was over the 2 MB DMA target), and
    Qwen B=64 ran 64 single-row invocations each streaming only ~0.7 MB.
    Batching Bb rows per invocation and letting the DMA grow toward the
    VMEM budget cuts invocations 4-8x at those geometries (44 and 16).
    Returns (0, 0) if S has no multiple-of-32 divisor."""
    best = None
    for Sb in range(min(S, 2048) // 32 * 32, 31, -32):
        if S % Sb:
            continue
        for Bb in (8, 4, 2, 1):
            if B % Bb:
                continue
            k_tile = Bb * Sb * kvH * hd
            if 2 * (2 * k_tile + 3 * (k_tile * 4 // hd)) > _VMEM_TILE_BUDGET:
                continue
            inv = (B // Bb) * (S // Sb)
            cand = (inv, -k_tile, Sb, Bb)
            if best is None or cand < best:
                best = cand
    if best is None:
        return 0, 0
    return best[2], best[3]


def decode_attn_supported(S: int, kv_heads: int, head_dim: int,
                          batch: int) -> bool:
    """Static gate: S must carry a multiple-of-32 divisor (any 64-multiple
    qualifies; quantized caches are allocated as 64-multiples everywhere in
    this repo for exactly this reason) and head_dim one lane register. No
    batch bound: the v2 kernel's effective bandwidth scales monotonically
    (273/413/473/507 GiB/s at B=8/16/24/32 S=672,
    tools/bench_attn_forms.py) — the v1 B>=24 collapse was an artifact of
    its per-rep (n_rep*kvH, kvH*hd) accumulator traffic, gone in v2.

    The gate asks ``_tile_plan`` — the same planner the kernel uses — so
    gate and plan cannot disagree: a geometry the planner cannot tile
    (no multiple-of-32 divisor of S, or no (Sb, Bb) under the VMEM
    budget) routes to the XLA fallback instead of tracing with Sb=0."""
    return head_dim == 128 \
        and _tile_plan(S, kv_heads, head_dim, batch) != (0, 0) \
        and _backend_on()


def _kernel(q_ref, kq_ref, ksx_ref, vq_ref, vsx_ref, bias_ref,
            k1q_ref, k1s_ref, v1q_ref, v1s_ref,
            out_ref, m_s, l_s, acc_s,
            *, n_rep: int, kvH: int, hd: int, H: int, Bb: int,
            sm_scale: float, n_steps: int):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    Sb = kq_ref.shape[2]
    R = Sb * kvH
    # row h keeps columns r with r % kvH == h // n_rep (its kv group)
    r_grp = jax.lax.broadcasted_iota(jnp.int32, (H, R), 1) % kvH
    h_grp = jax.lax.broadcasted_iota(jnp.int32, (H, R), 0) // n_rep
    for bi in range(Bb):
        sl = slice(bi * H, (bi + 1) * H)
        # native 5D tile; collapsing (Sb, kvH) with hd untouched is free
        K2 = kq_ref[0, bi].reshape(R, hd).astype(jnp.bfloat16)
        V2 = vq_ref[0, bi].reshape(R, hd).astype(jnp.bfloat16)
        qh = q_ref[bi]                                   # (H, hd) bf16
        s0 = jax.lax.dot_general(
            qh, K2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (H, R)
        ksx = ksx_ref[0, bi]                             # (1, R)
        bias = bias_ref[bi]                              # (1, R)
        s = jnp.where(r_grp == h_grp, s0 * ksx * sm_scale + bias, _NEG)
        m_old = m_s[sl]                                  # (H, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)                           # (H, R)
        m_s[sl] = m_new
        l_s[sl] = l_s[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pw = (p * vsx_ref[0, bi]).astype(jnp.bfloat16)   # (H, R)
        pv = jax.lax.dot_general(
            pw, V2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (H, hd)
        acc_s[sl] = acc_s[sl] * alpha + pv

    @pl.when(step == n_steps - 1)
    def _finish():
        # current-token merge + normalization IN-KERNEL (v3): the v2 kernel
        # returned raw (acc, m, l) and merged the new token in XLA — 3-4
        # small fusions per layer whose dispatch was most of the measured
        # ~95 us fixed per-call cost. Group selection via a one-hot matmul
        # (never a sublane repeat, which Mosaic restricts at kvH < 8).
        g_grp = jax.lax.broadcasted_iota(jnp.int32, (H, kvH), 1) == (
            jax.lax.broadcasted_iota(jnp.int32, (H, kvH), 0) // n_rep)
        for bi in range(Bb):
            sl = slice(bi * H, (bi + 1) * H)
            qh = q_ref[bi]                               # (H, hd)
            K1 = k1q_ref[bi, 0].astype(jnp.bfloat16)     # (kvH, hd)
            V1 = v1q_ref[bi, 0].astype(jnp.bfloat16)
            pnew = jax.lax.dot_general(
                qh, K1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (H, kvH)
            s_new = jnp.sum(
                jnp.where(g_grp, pnew * k1s_ref[bi] * sm_scale, 0.0),
                axis=1, keepdims=True)                   # (H, 1)
            m0, l0 = m_s[sl], l_s[sl]
            m_tot = jnp.maximum(m0, s_new)
            a_k = jnp.exp(m0 - m_tot)
            a_n = jnp.exp(s_new - m_tot)
            w1 = jnp.where(g_grp, a_n * v1s_ref[bi], 0.0).astype(jnp.bfloat16)
            pv1 = jax.lax.dot_general(
                w1, V1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (H, hd)
            out = (acc_s[sl] * a_k + pv1) / (l0 * a_k + a_n)
            out_ref[bi] = out.astype(out_ref.dtype)


def decode_attn_bias(mask, kvH: int):
    """Strict-prefix mask (B, S) bool -> additive bias in the kernel's
    (B, 1, S*kvH) row layout. Cheap (a few MB) — recomputed every step."""
    bias = jnp.where(mask, 0.0, _NEG).astype(jnp.float32)
    return jnp.repeat(bias, kvH, axis=1)[:, None, :]     # (B, 1, S*kvH)


def prepare_decode_attn_operands(k_s, v_s, mask):
    """Per-STEP operand prep, hoisted out of the per-layer kernel calls so
    the relayouts happen once: the per-(token, head) scales flattened to
    the kernel's (1, S*kvH) row layout and the strict-prefix mask expanded
    to an additive bias in the same layout.

    k_s/v_s: (L, B, S, kvH) f32 — the STEP-ENTRY cache scales.
    mask: (B, S) bool — valid slots EXCLUDING the current token's.

    The (L, B, S, kvH) -> (L, B, 1, S*kvH) scale flatten is a real tiled-
    layout relayout (~0.9 ms/step net at LLaVA B=32, measured in
    eval_results/decode_terms_llava_b32.json's prep term). Multi-step
    decode chains should pay it ONCE via ``make_decode_prep`` on the
    cache and thread the result through the steps (``prep=`` on the
    decode steps), which append to it incrementally."""
    L, B, S, kvH = k_s.shape
    ksx = k_s.reshape(L, B, 1, S * kvH)
    vsx = v_s.reshape(L, B, 1, S * kvH)
    return ksx, vsx, decode_attn_bias(mask, kvH)


@partial(jax.jit, static_argnames=("num_heads", "sm_scale", "layer",
                                   "interpret", "seq_tile", "batch_block"))
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
    batch_block: int = 0,
) -> jnp.ndarray:
    """Single-token attention against the int8 cache; returns (B, 1, H*hd)
    in q's dtype. HBM traffic: the int8 cache once, nothing widened.

    Pass the WHOLE step-entry cache with ``layer=i`` (selected by the
    BlockSpec index maps) and the current token's quantized K/V separately;
    append the token to the cache AFTER the last kernel read (one batched
    dynamic_update_slice per step) — see the module docstring's lessons.

    v3: the current token's merge AND the softmax normalization happen in
    the kernel's finish branch (one output, no XLA-side epilogue), and the
    grid batches ``batch_block`` rows per invocation (``_tile_plan``) — the
    two measured components of the v2 kernel's ~95 us fixed per-call cost
    (3 ms/step over LLaVA's 32 layers, VERDICT r4 item 2)."""
    L, B, S, kvH, hd = k_q.shape
    H = num_heads
    n_rep = H // kvH
    if seq_tile or batch_block:
        Sb = seq_tile or _seq_tile(S, kvH, hd)
        Bb = batch_block or 1
    else:
        Sb, Bb = _tile_plan(S, kvH, hd, B)
    assert S % Sb == 0 and Sb % 32 == 0 and B % Bb == 0, (S, Sb, B, Bb)
    n_steps = S // Sb
    qh = q[:, 0].astype(jnp.bfloat16)                    # (B, H, hd)
    li = layer
    out = pl.pallas_call(
        partial(_kernel, n_rep=n_rep, kvH=kvH, hd=hd, H=H, Bb=Bb,
                sm_scale=sm_scale, n_steps=n_steps),
        grid=(B // Bb, n_steps),
        in_specs=[
            pl.BlockSpec((Bb, H, hd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, Sb, kvH, hd), lambda b, s: (li, b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, 1, Sb * kvH), lambda b, s: (li, b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, Sb, kvH, hd), lambda b, s: (li, b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, 1, Sb * kvH), lambda b, s: (li, b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, Sb * kvH), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, kvH, hd), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, kvH), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, kvH, hd), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, kvH), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, H, hd), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bb * H, 1), jnp.float32),        # running max
            pltpu.VMEM((Bb * H, 1), jnp.float32),        # running sum
            pltpu.VMEM((Bb * H, hd), jnp.float32),       # weighted V
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
    )(qh, k_q, ksx, v_q, vsx, bias, k1_q, k1_s, v1_q, v1_s)
    return out.reshape(B, 1, H * hd).astype(q.dtype)
