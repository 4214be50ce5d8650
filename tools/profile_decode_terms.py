"""Per-term profile of one int8+kv8 decode step (VERDICT r3 item 1).

The decode benches measure the FULL step (tools/bench_decode.py,
tools/bench_qwen_decode.py); this tool decomposes it into independently
timed micro-programs so the gap between the measured step and its HBM
floor is attributed to named terms instead of asserted:

  full        the real decode step (baseline; matches the bench tools)
  kernel      the Pallas flash-decoding cache read: L chained
              decode_attn_quantcache calls + the per-step operand prep
              (prepare_decode_attn_operands) + the batched append —
              everything that touches the KV cache
  linears     the L transformer layers with attention replaced by identity:
              weight stream + activation quant/dequant + norms + rope
  lm_head     the final-norm + logits matmul (dense f32-upcast form), the
              argmax, and the next-token embedding lookup
  lm_head_i8  same with an int8-quantized head (the '+lm8' path)
  full_lm8    the real decode step with the int8 head

Each variant is a chained unrolled loop inside ONE jit with a true data
dependency (CLAUDE.md: the relay returns early for sub-100 ms programs and
adds ~30 ms per fetch), donated cache where the variant owns one.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/profile_decode_terms.py \
          [--family qwen|llava] [--batch 64] [--steps 16]
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401  (persistent compile cache config)
from attwarp_tpu.models.llama import (
    init_quant_kv_cache,
    make_decode_prep,
    rms_norm,
)
from attwarp_tpu.numerics.quant import (
    apply_linear,
    lm_logits,
    quantize_kv,
    quantize_lm_head,
)
from attwarp_tpu.ops.pallas_decode_attn import (
    decode_attn_quantcache,
    prepare_decode_attn_operands,
)

ap = argparse.ArgumentParser()
ap.add_argument("--family", choices=("qwen", "llava"), default="qwen")
ap.add_argument("--batch", type=int, default=0)
ap.add_argument("--steps", type=int, default=16)
ap.add_argument("--out", default="")
args = ap.parse_args()

if args.family == "qwen":
    from attwarp_tpu.models.qwen2vl import (
        Qwen2VLTextConfig,
        mrope_cos_sin,
        qwen2vl_decode_step,
    )

    cfg = Qwen2VLTextConfig()          # 28 layers, 3584, 28h/4kv, 152k vocab
    B = args.batch or 64
else:
    from attwarp_tpu.models.llama import (
        LlamaConfig,
        llama_decode_step,
    )

    cfg = LlamaConfig()                # 32 layers, 4096, 32h/32kv, 32k vocab
    B = args.batch or 32

T_CTX = 640
STEPS = args.steps
MAX_SEQ = -(-(T_CTX + STEPS) // 64) * 64
key = jax.random.PRNGKey(0)


def kshape():
    global key
    key, k = jax.random.split(key)
    return k


def lin(o, i):
    q = jax.random.randint(kshape(), (o, i), -127, 128, dtype=jnp.int8)
    s = jax.random.uniform(kshape(), (o,), jnp.float32, 0.5, 1.5) / (
        127 * np.sqrt(i))
    return {"q": q, "s": s}


def wb(o, i):
    w = lin(o, i)
    if args.family == "qwen":
        return w | {"b": jnp.zeros((o,), jnp.float32)}
    return w


D, I = cfg.hidden_size, cfg.intermediate_size
H, kvH, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim
L = cfg.num_hidden_layers
layers = []
for _ in range(L):
    layers.append({
        "q_proj": wb(H * hd, D), "k_proj": wb(kvH * hd, D),
        "v_proj": wb(kvH * hd, D),
        "o_proj": lin(D, H * hd), "gate_proj": lin(I, D),
        "up_proj": lin(I, D), "down_proj": lin(D, I),
        "input_layernorm": jnp.ones((D,), jnp.bfloat16),
        "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16),
    })
params = {
    "embed_tokens": jax.random.normal(
        kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "lm_head": jax.random.normal(
        kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "norm": jnp.ones((D,), jnp.bfloat16),
    "layers": layers,
}
params_lm8 = dict(params) | {"lm_head": quantize_lm_head(params)["lm_head"]}

# NOTE: no cache is allocated here — at LLaVA geometry the B=32 int8 cache
# is 5.67 GiB, and holding one through the whole run beside both param sets
# OOM'd the `full` variant (two more caches live during its timing loop).
# `prep_only` builds its scale operands at the END, after params are freed.
kv_mask = (jnp.arange(MAX_SEQ)[None, :] < T_CTX + 1).repeat(B, 0)
emb0 = jax.random.normal(kshape(), (B, 1, D), jnp.bfloat16) * 0.1
if args.family == "qwen":
    pos3 = jnp.broadcast_to(jnp.full((B, 1), T_CTX)[None], (3, B, 1))
    cos1, sin1 = mrope_cos_sin(pos3, cfg)


def fresh_kv():
    return init_quant_kv_cache(cfg, B, MAX_SEQ)


KV_SENTINEL = object()


def time_it(fn, *arrays, donate=()):
    f = jax.jit(fn, donate_argnums=donate)

    def args_now():
        return [fresh_kv() if a is KV_SENTINEL else a for a in arrays]

    def fetch(out):
        # scalar fetch: block_until_ready returns early through the relay
        # for short programs (CLAUDE.md), under-measuring sub-100 ms terms
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])

    out = f(*args_now())
    fetch(out)
    del out
    best = float("inf")
    for _ in range(3):
        arrs = args_now()
        t0 = time.perf_counter()
        out = f(*arrs)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
        del out
    return best / STEPS * 1e3

results = {}

# ── full step ────────────────────────────────────────────────────────────


def step(p, emb, kv, prep):
    if args.family == "qwen":
        return qwen2vl_decode_step(
            p, cfg, emb, kv, jnp.int32(T_CTX), cos1, sin1, kv_mask,
            prep=prep)
    pos = jnp.full((B,), T_CTX, jnp.int32)
    return llama_decode_step(
        p, cfg, emb, kv, jnp.int32(T_CTX), pos, kv_mask, prep=prep)


def full(p, emb, kv):
    # the production chain form: the scale relayout is paid ONCE via
    # make_decode_prep and carried (matches generate / the engine / the
    # bench tools); prep_only below prices the per-step form it replaced
    probe = jnp.float32(0)
    prep = make_decode_prep(kv)
    for _ in range(STEPS):
        if prep is None:
            logits, kv, _ = step(p, emb, kv, None)
        else:
            logits, kv, _, prep = step(p, emb, kv, prep)
        nxt = jnp.argmax(logits, axis=-1)
        emb = p["embed_tokens"][nxt][:, None, :]
        probe = probe + logits[0, 0]
    return emb[0, 0, 0] + probe, kv


def timed_full(p):
    f = jax.jit(partial(full), donate_argnums=(2,))
    out, kv = f(p, emb0, fresh_kv())
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        # drop the previous run's (donation-aliased) cache BEFORE allocating
        # the next one: two live 5.67 GiB LLaVA B=32 caches beside the 6.5
        # GiB params OOM'd; allocation also stays outside the timed region
        # (zero-filling 5.67 GiB is ~7 ms of HBM writes).
        out = kv = None
        kv_in = fresh_kv()
        # scalar fetch = the only true completion barrier through the relay
        int(kv_in.k_q[(0,) * kv_in.k_q.ndim])
        t0 = time.perf_counter()
        out, kv = f(p, emb0, kv_in)
        jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


results["full"] = timed_full(params)
results["full_lm8"] = timed_full(params_lm8)
# the 16-step unrolled full-step executables pin device workspace; drop
# them before the next sections compile (first OOM'd here at qwen B=64)
jax.clear_caches()

sm = 1.0 / float(np.sqrt(hd))
k1q = jax.random.randint(kshape(), (B, 1, kvH, hd), -127, 128, dtype=jnp.int8)
k1s = jnp.ones((B, 1, kvH), jnp.float32) * 0.01


def kernel_prog(kv, q0):
    # production form (round 5): the scale relayout is paid ONCE per chain
    # (make_decode_prep) and carried; per-step prep is just the mask bias
    # + one tiny incremental scale append
    from attwarp_tpu.models.llama import QuantKVCache, make_decode_prep
    from attwarp_tpu.ops.pallas_decode_attn import decode_attn_bias

    probe = q0
    ksx, vsx = make_decode_prep(kv)
    for _ in range(STEPS):
        strict = kv_mask & (jnp.arange(MAX_SEQ)[None, :] != T_CTX)
        bias = decode_attn_bias(strict, kvH)
        q = probe
        appends = []
        for i in range(L):
            out = decode_attn_quantcache(
                q, kv.k_q, ksx, kv.v_q, vsx, bias,
                k1q, k1s, k1q, k1s,
                num_heads=H, sm_scale=sm, layer=i)
            q = out.reshape(B, 1, H, hd).astype(jnp.bfloat16)
            appends.append((k1q[:, 0], k1s[:, 0]))
        upd = jnp.stack([a for a, _ in appends])
        upds = jnp.stack([s for _, s in appends])

        def app(c, u):
            zeros = (0,) * (c.ndim - 3)
            return jax.lax.dynamic_update_slice(
                c, u[:, :, None], (0, 0, T_CTX, *zeros))

        kv = QuantKVCache(app(kv.k_q, upd), app(kv.k_s, upds),
                          app(kv.v_q, upd), app(kv.v_s, upds))
        ksx = jax.lax.dynamic_update_slice(
            ksx, upds[:, :, None], (0, 0, 0, T_CTX * kvH))
        vsx = jax.lax.dynamic_update_slice(
            vsx, upds[:, :, None], (0, 0, 0, T_CTX * kvH))
        probe = q
    return probe[0, 0, 0, 0], kv


q0 = jax.random.normal(kshape(), (B, 1, H, hd), jnp.bfloat16)
# timed at the END (see below): the kernel/prep programs need ~4 GiB of
# fresh+donated caches, which only fit after params are deleted

# prep alone (chained by feeding a reduced scalar back into the mask? the
# scales are static -> chain via adding the previous result's first element)


def prep_prog(ks, vs):
    probe = jnp.float32(0)
    for _ in range(STEPS):
        strict = kv_mask & (jnp.arange(MAX_SEQ)[None, :] != T_CTX)
        ksx, vsx, bias = prepare_decode_attn_operands(
            ks + probe * 0, vs, strict)
        probe = probe + ksx[0, 0, 0, 0] + vsx[0, 0, 0, 0] + bias[0, 0, 0]
    return probe


# ── linears term: the L layers with attention = identity ────────────────


def linears_prog(p, emb):
    x = emb
    probe = jnp.float32(0)
    for _ in range(STEPS):
        for lp in p["layers"]:
            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            qv = apply_linear(h, lp["q_proj"])
            kx = apply_linear(h, lp["k_proj"])
            vx = apply_linear(h, lp["v_proj"])
            # the real step quantizes the new token's K/V per layer — keep
            # that cost in, and its outputs live via the probe
            kq, ks = quantize_kv(kx.reshape(B, 1, kvH, hd))
            vq, vs = quantize_kv(vx.reshape(B, 1, kvH, hd))
            probe = probe + ks.sum() + vs.sum() + (
                kq[0, 0, 0, 0] + vq[0, 0, 0, 0]).astype(jnp.float32)
            x = x + apply_linear(qv, lp["o_proj"])   # identity attention
            h2 = rms_norm(x, lp["post_attention_layernorm"],
                          cfg.rms_norm_eps)
            x = x + apply_linear(
                jax.nn.silu(apply_linear(h2, lp["gate_proj"]))
                * apply_linear(h2, lp["up_proj"]), lp["down_proj"])
        x = x * 0.5
    return x[0, 0, 0] + probe


results["linears_only"] = time_it(linears_prog, params, emb0)

# ── lm_head term: norm + logits + argmax + embed ─────────────────────────


def lm_prog(p, emb):
    x = emb
    for _ in range(STEPS):
        xn = rms_norm(x, p["norm"], cfg.rms_norm_eps)
        logits = lm_logits(xn[:, 0], p)
        nxt = jnp.argmax(logits, axis=-1)
        x = p["embed_tokens"][nxt][:, None, :]
    return x[0, 0, 0]


results["lm_head_dense"] = time_it(lm_prog, params, emb0)
results["lm_head_int8"] = time_it(lm_prog, params_lm8, emb0)

# ── cache term LAST: params (8+ GiB at 7B) must go first so the fresh +
#    donated caches and the kernel executables fit beside kv0 ────────────
del params, params_lm8, layers
jax.clear_caches()
results["kernel+prep+append"] = time_it(
    kernel_prog, KV_SENTINEL, q0, donate=(0,))
kv_tail = fresh_kv()
ks_tail, vs_tail = kv_tail.k_s, kv_tail.v_s
del kv_tail                       # keep only the scale planes for prep_only
results["prep_only"] = time_it(prep_prog, ks_tail, vs_tail)

# ── relay constant: the fixed per-fetch cost every chained micro-program
#    pays once (CLAUDE.md: ~30 ms through the axon relay; ~0 on CPU) ─────
_tiny = jax.jit(lambda x: x + 1)
jax.block_until_ready(_tiny(jnp.float32(0)))
relay = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    float(_tiny(jnp.float32(0)))
    relay = min(relay, time.perf_counter() - t0)
relay_ms = relay * 1e3

# ── HBM-floor accounting (819 GB/s v5e) ─────────────────────────────────
GBps = 819e9
cache_bytes = 2 * L * B * MAX_SEQ * kvH * (hd + 4)       # int8 K+V + f32 scales
dec_bytes = L * (  # int8 decoder linears + their f32 scales, per step
    (H * hd * D + 2 * kvH * hd * D + H * hd * D + 3 * I * D)
    + 4 * (H * hd + 2 * kvH * hd + H * hd + 2 * I + D))
head_bytes = cfg.vocab_size * D * 2                      # bf16 lm_head
floors = {
    "cache_read_ms": round(cache_bytes / GBps * 1e3, 3),
    "decoder_weights_ms": round(dec_bytes / GBps * 1e3, 3),
    "lm_head_ms": round(head_bytes / GBps * 1e3, 3),
}

# ── report ───────────────────────────────────────────────────────────────
attr = (results["kernel+prep+append"] + results["linears_only"]
        + results["lm_head_dense"])
rps = relay_ms / STEPS
report = {
    "family": args.family, "batch": B, "steps": STEPS,
    "ctx": T_CTX, "max_seq": MAX_SEQ,
    "ms_per_step": {k: round(v, 3) for k, v in results.items()},
    "relay_constant_ms_per_fetch": round(relay_ms, 3),
    "relay_constant_ms_per_step": round(rps, 3),
    "ms_per_step_net_of_relay": {
        k: round(v - rps, 3) for k, v in results.items()},
    "hbm_floors_ms": floors,
    "attributed_ms": round(attr, 3),
    "residual_ms_full_minus_attributed": round(results["full"] - attr, 3),
    "lm8_full_step_saving_ms": round(
        results["full"] - results["full_lm8"], 3),
    "note": (
        "Every ms_per_step entry is its own chained micro-program timed "
        "through the relay, so each carries relay_constant_ms_per_step "
        "once; attributed_ms sums three such programs and double-counts "
        "the constant twice and loses cross-program overlap, which is why "
        "residual_ms_full_minus_attributed can be negative. Compare "
        "ms_per_step_net_of_relay against hbm_floors_ms for per-term "
        "efficiency. prep_only is the per-step full scale relayout that "
        "the carried-prep production form (make_decode_prep) replaces "
        "with one relayout per chain; full, full_lm8 and "
        "kernel+prep+append use the carried production form."),
}
print(json.dumps(report, indent=2))
if args.out:
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
