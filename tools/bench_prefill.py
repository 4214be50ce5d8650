"""7B prefill throughput at extraction shape: dense vs flash attention.

The 640-token prefill (prompt + 576 image tokens) is extraction's hot loop
(SURVEY §3.1 HOT LOOP 1 — model.generate fires the hook per decode step but
the prefill dominates at max_new_tokens=20). This measures llama_prefill at
LLaVA-7B shape with layer-20 extraction, bf16 weights, dense vs the Pallas
flash-attention kernel.

Run on TPU:  PYTHONPATH=.:$PYTHONPATH python tools/bench_prefill.py dense|flash [batch] [seqlen]
Iterations are chained inside one jit (a scalar from the logits is folded
back into the embeddings) so the relay can't return early and XLA can't
eliminate the forward.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.models.llama import LlamaConfig, llama_prefill

MODE = sys.argv[1] if len(sys.argv) > 1 else "dense"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T = int(sys.argv[3]) if len(sys.argv) > 3 else 640
ITERS = 4
EXTRACT_LAYER = 20
cfg = LlamaConfig()  # 7B: 4096 / 11008 / 32 layers / 32 heads, vocab 32000
key = jax.random.PRNGKey(0)


def kshape():
    global key
    key, k = jax.random.split(key)
    return k


def lin(o, i):
    return jax.random.normal(kshape(), (o, i), jnp.bfloat16) / float(np.sqrt(i))


D, I = cfg.hidden_size, cfg.intermediate_size
params = {
    "embed_tokens": jax.random.normal(kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "lm_head": jax.random.normal(kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "norm": jnp.ones((D,), jnp.bfloat16),
    "layers": [
        {
            "q_proj": lin(D, D), "k_proj": lin(D, D), "v_proj": lin(D, D),
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
emb0 = jax.random.normal(kshape(), (B, T, D), jnp.bfloat16) * 0.1
use_flash = MODE == "flash"


@jax.jit
def run(params, emb):
    def body(emb, _):
        logits, _kv, row = llama_prefill(
            params, cfg, emb, mask, max_seq=T,
            extract_layer=EXTRACT_LAYER, use_flash=use_flash,
        )
        # true data dependency: logits + extraction row feed the next input
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
flops = 2 * 6.74e9 * B * T  # matmul FLOPs per prefill (params ~6.74B)
print(
    f"{MODE}: {per_prefill:.1f} ms/prefill at B={B} T={T} "
    f"({B / (best / ITERS):.2f} samples/s; "
    f"~{flops / (best / ITERS) / 1e12:.1f} TFLOP/s bf16)"
)
