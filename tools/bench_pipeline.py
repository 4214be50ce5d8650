"""End-to-end TWO-PASS pipeline throughput at LLaVA-7B shape.

THE product number: the reference's full flow — extract attention (pass 1,
`main_batched.py:123-314`) → MOTA mask → warp → answer on the warped image
(pass 2, `new_method.py:508-615`) — as TextVQA samples/sec on one chip,
through the real `AttWarpPipeline.run` (host preprocess, tokenization, the
batched device warp, and both MLLM passes all included).

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_pipeline.py [mode] [batch]
      mode: bf16 | int8[+flash][+kv8]   (default int8+flash, the extraction
      sweet spot — ARCHITECTURE.md); batch default 16.

Random weights at exact 7B geometry (shape-dependent throughput only), with
a self-contained word-level tokenizer so the text-level extract/answer APIs
run for real. First call compiles the 640-token extraction prefill, the
decode step, the warp, and the answer program — at int8+flash B=16 budget
~10-25 min through the relay for the one-time compile (CLAUDE.md).
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for tools.*

from tools.bench_utils import make_llava_7b_backend  # noqa: E402
from tools.make_random_7b_ckpt import build_dry_run_tokenizer  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+flash"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

backend, label = make_llava_7b_backend(MODE, tokenizer=build_dry_run_tokenizer())

from attwarp_tpu.pipeline import AttWarpPipeline  # noqa: E402

pipe = AttWarpPipeline(backend, warp_size=500, max_new_tokens=20)

rng = np.random.default_rng(0)
QUESTIONS = ["what is the text on the label?"] * B


def make_images():
    # native-res driver inputs (bucketed to 512x640 by the pipeline)
    return [(rng.random((480, 640, 3)) * 255).astype(np.uint8)
            for _ in range(B)]


print(f"two-pass pipeline: {label}, B={B}; compiling (can take many "
      "minutes at int8+flash B>=16 through the relay) ...")
t0 = time.perf_counter()
res = pipe.run(make_images(), QUESTIONS)
print(f"compiled + first batch in {time.perf_counter()-t0:.0f}s; "
      f"maps {res.attention_maps.shape}, warped {res.warped.shape}, "
      f"answers {len(res.second_answers)}")
assert np.isfinite(res.warped).all()

ITERS = 2
times = []
for _ in range(3):
    imgs = make_images()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        res = pipe.run(imgs, QUESTIONS)
    times.append((time.perf_counter() - t0) / ITERS)
best = min(times)
print(f"pipeline {label}: {best*1e3:.0f} ms/batch (B={B}; extract 640-tok "
      f"prefill + 20 decode -> mask -> 500px warp -> answer 20 new) "
      f"-> {B/best:.2f} samples/s end-to-end")
