"""Qwen2-VL-7B text prefill throughput: dense vs flash attention.

The second family's extraction prefill (M-RoPE; GQA 28 q-heads / 4
kv-heads, 3584 wide, 28 layers) at the 640-token extraction bucket —
the measured point VERDICT round-2 item 5 asked for once the Pallas flash
kernel was shared with the Qwen prefill (``models/qwen2vl.py``).

Run on TPU:  PYTHONPATH=.:$PYTHONPATH python tools/bench_qwen_prefill.py dense|flash [batch] [seqlen]
Iterations are chained inside one jit (a probe scalar folds back into the
embeddings) so the relay can't return early and XLA can't hoist anything.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.models.qwen2vl import (
    Qwen2VLTextConfig,
    mrope_cos_sin,
    qwen2vl_prefill,
)

MODE = sys.argv[1] if len(sys.argv) > 1 else "dense"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T = int(sys.argv[3]) if len(sys.argv) > 3 else 640
ITERS = 4
EXTRACT_LAYER = 20
cfg = Qwen2VLTextConfig()  # 7B text tower: 3584/18944, 28 layers, 28h/4kv
key = jax.random.PRNGKey(0)


def kshape():
    global key
    key, k = jax.random.split(key)
    return k


def lin(o, i):
    return jax.random.normal(kshape(), (o, i), jnp.bfloat16) / float(np.sqrt(i))


def wb(o, i):
    return {"weight": lin(o, i), "bias": jnp.zeros((o,), jnp.bfloat16)}


D, I = cfg.hidden_size, cfg.intermediate_size
kvd = cfg.kv_heads * cfg.head_dim
params = {
    "embed_tokens": jax.random.normal(kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "lm_head": jax.random.normal(kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "norm": jnp.ones((D,), jnp.bfloat16),
    "layers": [
        {
            "q_proj": wb(D, D), "k_proj": wb(kvd, D), "v_proj": wb(kvd, D),
            "o_proj": lin(D, D), "gate_proj": lin(I, D), "up_proj": lin(I, D),
            "down_proj": lin(D, I),
            "input_layernorm": jnp.ones((D,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16),
        }
        for _ in range(cfg.num_hidden_layers)
    ],
}
nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
print(f"params: {nbytes/2**30:.2f} GiB bf16; B={B} T={T} mode={MODE}")

mask = jnp.ones((B, T), bool)
pos = jnp.broadcast_to(jnp.arange(T)[None, None, :], (3, B, T))
cos, sin = mrope_cos_sin(pos, cfg)
emb0 = jax.random.normal(kshape(), (B, T, D), jnp.bfloat16) * 0.1
use_flash = MODE == "flash"


@jax.jit
def run(params, emb):
    def body(emb, _):
        logits, _kv, row = qwen2vl_prefill(
            params, cfg, emb, mask, cos, sin, max_seq=T,
            extract_layer=EXTRACT_LAYER, use_flash=use_flash,
        )
        probe = (logits[0, 0] + row.sum()).astype(emb.dtype) * 1e-12
        return emb + probe, logits[0, 0]

    emb, probes = jax.lax.scan(body, emb, jnp.arange(ITERS))
    return emb[0, 0, 0] + probes.sum()


out = run(params, emb0)
print("compiled; probe:", jax.device_get(out))
times = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.device_get(run(params, emb0))
    times.append(time.perf_counter() - t0)
best = min(times)
per_prefill = best / ITERS * 1e3
n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
flops = 2 * n_params * B * T
print(
    f"{MODE}: {per_prefill:.1f} ms/prefill at B={B} T={T} "
    f"({B / (best / ITERS):.2f} samples/s; "
    f"~{flops / (best / ITERS) / 1e12:.1f} TFLOP/s bf16)"
)
