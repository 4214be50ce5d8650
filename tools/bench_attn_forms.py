"""Decode attention against the int8 KV cache: which form streams int8?

The B>=16 decode collapse (15.6 ms/step at B=8 -> 47 ms at B=16, 3x time
for 2x batch, far above the byte roofline) points at the attention read:
if XLA materializes the int8->bf16 cache convert instead of fusing it into
the matmul operand load, HBM sees 2-byte traffic plus a full extra
write+read per layer. This micro-bench times ONE decode-attention op
(7B geometry: 32 heads x 128, S=672) iterated inside one jit with a data
dependency, for each candidate form:

  dequant  - k = dequantize_kv(k8, ks); jnp einsum attention (the B<16 path)
  factored - logits = (q . k8.astype) * ks; pv = (probs * vs) . v8.astype
             (the current B>=16 path)
  int8dot  - q quantized per (token, head); logits = dot_general(q8, k8,
             preferred_element_type=int32) * (qs * ks); pv likewise with
             probs quantized per row (s8 x s8 -> s32 native on v5e)

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_attn_forms.py [batch] [S]
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
S = int(sys.argv[2]) if len(sys.argv) > 2 else 672
H, HD = 32, 128
# fetching ANY result through the axon relay costs a fixed ~30 ms round
# trip (the round-3 calibration probe: a no-op jit fetched with device_get
# measures 30.4 ms; 50/200/800 chained 88-MiB reduces measure 126/333/535
# "GiB/s" — the fit gives ~28 ms constant + the true rate). 400 iterations
# keep that constant under ~10% of the total for every form here.
ITERS = int(os.environ.get("ATTN_FORMS_ITERS", "400"))
scale = 1.0 / np.sqrt(HD)

key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
k8 = jax.random.randint(k1, (B, S, H, HD), -127, 128, dtype=jnp.int8)
v8 = jax.random.randint(k2, (B, S, H, HD), -127, 128, dtype=jnp.int8)
ks = jax.random.uniform(k3, (B, S, H), jnp.float32, 0.5, 1.5) / 127
vs = jax.random.uniform(k4, (B, S, H), jnp.float32, 0.5, 1.5) / 127
q0 = jax.random.normal(k5, (B, 1, H, HD), jnp.bfloat16)
mask = jnp.ones((B, 1, S), bool)


def attn_dequant(q):
    k = (k8.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16))
    v = (v8.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask[:, None, :, :].transpose(0, 1, 2, 3), logits,
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def attn_factored(q):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k8.astype(q.dtype))
    logits = logits.astype(jnp.float32) * jnp.transpose(ks, (0, 2, 1))[:, :, None, :]
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * jnp.transpose(vs, (0, 2, 1))[:, :, None, :]
    return jnp.einsum("bhqk,bkhd->bqhd", pv.astype(q.dtype), v8.astype(q.dtype))


def attn_int8dot_fixed(q):
    q32 = q.astype(jnp.float32)
    qs = jnp.max(jnp.abs(q32), axis=-1, keepdims=True) / 127.0 + 1e-12
    q8 = jnp.clip(jnp.round(q32 / qs), -127, 127).astype(jnp.int8)
    k8t = k8.transpose(0, 2, 1, 3)   # (B,H,S,hd)
    v8t = v8.transpose(0, 2, 1, 3)
    logits = jax.lax.dot_general(
        q8.transpose(0, 2, 1, 3), k8t,
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B,H,1,S)
    lscale = qs[:, 0, :, 0][:, :, None, None] * ks.transpose(0, 2, 1)[:, :, None, :]
    logits = logits.astype(jnp.float32) * lscale * scale
    probs = jax.nn.softmax(logits, axis=-1)
    # fold the per-(token,head) v scale into probs BEFORE quantizing: the
    # weighted probs row sums to ~1x scale so int8 stays accurate
    pw = probs * vs.transpose(0, 2, 1)[:, :, None, :]
    pws = jnp.max(pw, axis=-1, keepdims=True) / 127.0 + 1e-12
    p8 = jnp.clip(jnp.round(pw / pws), 0, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        p8, v8t,
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B,H,1,hd)
    return out.astype(jnp.float32) * pws


k8T = jnp.asarray(np.asarray(k8).transpose(0, 2, 1, 3))  # (B,H,S,hd) layout
v8T = jnp.asarray(np.asarray(v8).transpose(0, 2, 1, 3))
ksT = jnp.asarray(np.asarray(ks).transpose(0, 2, 1))     # (B,H,S)
vsT = jnp.asarray(np.asarray(vs).transpose(0, 2, 1))


def attn_factored_hmajor(q):
    """Same math as ``factored`` but the cache is STORED head-major
    ((B,H,S,hd)): per (b,h) the S rows stream contiguously, testing whether
    the (B,S,H,hd) token-major layout is what starves the read."""
    qT = q.transpose(0, 2, 1, 3)                          # (B,H,1,hd)
    logits = jax.lax.dot_general(
        qT, k8T.astype(q.dtype),
        (((3,), (3,)), ((0, 1), (0, 1))),
    )                                                     # (B,H,1,S)
    logits = logits.astype(jnp.float32) * ksT[:, :, None, :] * scale
    probs = jax.nn.softmax(logits, axis=-1)
    pw = (probs * vsT[:, :, None, :]).astype(q.dtype)
    out = jax.lax.dot_general(
        pw, v8T.astype(q.dtype),
        (((3,), (2,)), ((0, 1), (0, 1))),
    )                                                     # (B,H,1,hd)
    return out


def attn_pallas(q):
    """ops/pallas_decode_attn.py: stream the int8 cache once, widen/scale/
    softmax/PV entirely in VMEM. The kernel's contract is stale-read +
    external current-token merge, so this form attends S-1 history slots
    plus a merged token (the XLA forms attend S slots — same bytes)."""
    from attwarp_tpu.ops.pallas_decode_attn import (
        decode_attn_quantcache,
        prepare_decode_attn_operands,
    )

    strict = mask[:, 0, :].at[:, S - 1].set(False)
    ksx, vsx, bias = prepare_decode_attn_operands(ks[None], vs[None], strict)
    out = decode_attn_quantcache(
        q, k8[None], ksx, v8[None], vsx, bias,
        k8[:, S - 1:S], ks[:, S - 1:S], v8[:, S - 1:S], vs[:, S - 1:S],
        num_heads=H, sm_scale=scale,
    )
    return out.reshape(B, 1, H, HD)


FORMS = {
    "dequant": attn_dequant,
    "factored": attn_factored,
    "int8dot": attn_int8dot_fixed,
    "hmajor": attn_factored_hmajor,
    "pallas": attn_pallas,
}

which = sys.argv[3] if len(sys.argv) > 3 else None
int8_bytes = 2 * B * S * H * HD  # k+v int8 per call
for name, fn in FORMS.items():
    if which and name != which:
        continue

    @jax.jit
    def run(q, fn=fn):
        def body(q, _):
            out = fn(q)
            probe = jnp.asarray(out, jnp.float32).sum() * 1e-9
            return (q + probe.astype(q.dtype)), probe
        q, probes = jax.lax.scan(body, q, jnp.arange(ITERS))
        return q[0, 0, 0, 0] + probes.sum()

    out = run(q0)
    jax.device_get(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(q0))
        times.append(time.perf_counter() - t0)
    per = min(times) / ITERS
    print(f"{name:9s}: {per*1e3:7.3f} ms/call  "
          f"(int8 cache bytes {int8_bytes/2**20:.0f} MiB -> "
          f"{int8_bytes/per/2**30:.0f} GiB/s effective)")
