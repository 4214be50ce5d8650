"""Pallas decode-attention kernel over the int8 KV cache.

WHY. Single-token decode attention against the quantized cache is the term
that collapses at B>=16 (ARCHITECTURE.md "int8 KV cache"): the XLA forms
achieve ~66-106 GiB/s on the int8 cache bytes — an order of magnitude under
the 819 GB/s v5e HBM roofline — because the int8 element loads plus the
per-(token, head) f32 scale multiply vectorize poorly, and every "fix"
expressible in XLA (explicit dequant, native s8xs8->s32 dot_general,
head-major layout) materializes a wider intermediate in HBM and measures
worse (tools/bench_attn_forms.py). The cache read is the whole cost — at
7B geometry the arithmetic is ~2 flops/byte — so the winning move is a
kernel that streams the int8 bytes from HBM exactly once and does ALL
widening, scaling, softmax, and the PV reduction on-chip.

SHAPE OF THE KERNEL. Flash-decoding: grid (B, S/Sb), S sequential, online-
softmax running stats in VMEM scratch. Per step one (Sb, kvH*hd) int8 K
tile and V tile stream in (the cache is (B, S, kvH, hd) token-major, so a
(B, S, kvH*hd) reshape is free and each tile is one linear HBM burst).

The per-head multiply-reduce runs on the MXU, not the VPU (a first, pure-
VPU version measured 1.18 ms at B=16 S=672 — the elementwise widen +
multiply + tree-reduce over 88M elements is register-bandwidth-bound):

  scores_tile (Sb, kvH)   = (K2 int8->bf16) @ Qbd
  pv_tile     (kvH, kvH*hd) = (p * v_scale) @ (V2 int8->bf16)

where Qbd is the query laid out BLOCK-DIAGONALLY ((kvH*hd, kvH); column g
holds q[g] in rows g*hd..(g+1)*hd) so one matmul computes every head's
q.k in its own output column, and the PV product accumulates a dense
(kvH, kvH*hd) block whose diagonal (g, g*hd..) strips are the real
per-head outputs — 1/kvH of its FLOPs are useful, but MXU FLOPs at this
arithmetic intensity are ~free next to the int8 stream, and the dense
form needs no in-kernel transposes or lane<->sublane relayouts of the
big operands. Softmax stats live in (kvH, Sb) layout (heads on sublanes,
seq on lanes) so every reduction is a lane reduction, the only class
Mosaic lowers. GQA runs the rep loop statically (reference semantics:
q head h = kv_head * n_rep + rep, matching models/llama.py::_repeat_kv).

Numerics match `_attn_quantcache`: q.k products in bf16 (exactly the XLA
form's einsum dtype) with f32 accumulation, softmax in f32 — inside the
decode contract (cos > 0.999 vs the dense cache; greedy tokens match).

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


def _seq_tile(S: int) -> int:
    """Largest divisor of S that is a multiple of 32 (the int8 sublane
    tile), capped at 256 (keeps the per-step tiles a few MB and the grid
    deep enough to pipeline). Returns 0 if none exists."""
    for b in range(min(256, S) // 32 * 32, 31, -32):
        if S % b == 0:
            return b
    return 0


def decode_attn_supported(S: int, kv_heads: int, head_dim: int,
                          batch: int) -> bool:
    """Static gate: S must carry a multiple-of-32 divisor <=256 (cache
    sizes are 64-multiples everywhere here: extract/offsets.py buckets
    prompts to 64; serving sizes follow), head_dim one lane register, and
    batch <=16 — the kernel's measured win region. At B=8/16 S=672 it
    beats the best XLA form 1.29x/1.45x (0.150/0.215 ms vs dequant 0.228
    and factored 0.310, tools/bench_attn_forms.py, relay constant
    amortized over 400 chained iterations), but at B>=24 the grid's
    effective bandwidth collapses to ~180 GiB/s (0.683 ms at B=24 vs
    factored's 0.347) — reproduced twice — so larger batches keep the
    scale-factored XLA form."""
    return (head_dim == 128 and _seq_tile(S) != 0 and batch <= 16
            and _backend_on())


def _kernel(qbd_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, out_ref,
            m_ref, l_ref, acc_ref, *, n_rep: int, kvH: int, hd: int,
            sm_scale: float, n_steps: int):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kbf = kq_ref[0].astype(jnp.bfloat16)                 # (Sb, kvH*hd)
    vbf = vq_ref[0].astype(jnp.bfloat16)
    ks = ks_ref[0]                                       # (Sb, kvH)
    vs = vs_ref[0]
    bias = bias_ref[0]                                   # (Sb, 1)
    for r in range(n_rep):
        qbd = qbd_ref[0, r]                              # (kvH*hd, kvH)
        s0 = jax.lax.dot_general(
            kbf, qbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (Sb, kvH)
        s = ((s0 * ks) * sm_scale + bias).T              # (kvH, Sb)
        rows = pl.ds(r * kvH, kvH)                       # rep-major rows
        m_old = m_ref[rows]                              # (kvH, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1)[:, None])
        alpha = jnp.exp(m_old - m_new)                   # (kvH, 1)
        p = jnp.exp(s - m_new)                           # (kvH, Sb)
        m_ref[rows] = m_new
        l_ref[rows] = l_ref[rows] * alpha + jnp.sum(p, axis=1)[:, None]
        pw = (p * vs.T).astype(jnp.bfloat16)             # (kvH, Sb)
        pv = jax.lax.dot_general(
            pw, vbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (kvH, kvH*hd)
        acc_ref[rows] = acc_ref[rows] * alpha + pv

    @pl.when(step == n_steps - 1)
    def _finish():
        acc = acc_ref[...] / l_ref[...]                  # (n_rep*kvH, kvH*hd)
        # the useful outputs are the block-diagonal strips; output head
        # order is h = g*n_rep + r, acc row order is rep-major (r, g)
        rows = []
        for g in range(kvH):
            for r in range(n_rep):
                rows.append(acc[r * kvH + g:r * kvH + g + 1,
                                g * hd:(g + 1) * hd])
        out_ref[0] = rows[0] if len(rows) == 1 else jnp.concatenate(rows, 0)


@partial(jax.jit, static_argnames=("num_heads", "sm_scale", "interpret"))
def decode_attn_quantcache(
    q: jnp.ndarray,        # (B, 1, H, hd) any float dtype
    k_q: jnp.ndarray,      # (B, S, kvH, hd) int8
    k_s: jnp.ndarray,      # (B, S, kvH) f32
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    mask: jnp.ndarray,     # (B, S) bool — valid cache slots
    *,
    num_heads: int,
    sm_scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token attention against the int8 cache; returns (B, 1, H*hd)
    in q's dtype. HBM traffic: the int8 cache once, nothing widened."""
    B, S, kvH, hd = k_q.shape
    n_rep = num_heads // kvH
    Sb = _seq_tile(S)
    n_steps = S // Sb
    # block-diagonal queries: qbd[b, r, g*hd+d, g] = q[b, g*n_rep+r, d]
    q3 = q[:, 0].reshape(B, kvH, n_rep, hd).astype(jnp.bfloat16)
    eye = jnp.eye(kvH, dtype=jnp.bfloat16)
    qbd = jnp.einsum("bgrd,gh->brgdh", q3, eye).reshape(
        B, n_rep, kvH * hd, kvH
    )
    # (B, S, 1): the trailing unit dim keeps the BlockSpec's last-two-dims
    # tiling legal (Sb % 8 == 0, last dim equals the array's) and broadcasts
    # over kv heads in the kernel.
    bias = jnp.where(mask, 0.0, _NEG).astype(jnp.float32)[..., None]
    out = pl.pallas_call(
        partial(_kernel, n_rep=n_rep, kvH=kvH, hd=hd, sm_scale=sm_scale,
                n_steps=n_steps),
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, n_rep, kvH * hd, kvH), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, kvH * hd), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, kvH), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, kvH * hd), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, kvH), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_heads, hd), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_heads, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_rep * kvH, 1), jnp.float32),        # running max
            pltpu.VMEM((n_rep * kvH, 1), jnp.float32),        # running sum
            pltpu.VMEM((n_rep * kvH, kvH * hd), jnp.float32),  # weighted V
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * kvH * hd * kvH * n_rep * 2,
            bytes_accessed=B * (2 * S * kvH * hd + 2 * S * kvH * 4),
            transcendentals=B * S * kvH * n_rep,
        ),
        interpret=interpret,
    )(qbd, k_q.reshape(B, S, kvH * hd), k_s,
      v_q.reshape(B, S, kvH * hd), v_s, bias)
    return out.reshape(B, 1, num_heads * hd).astype(q.dtype)
