"""Phase breakdown of AttWarpPipeline.run at 7B shape (where do the ms go?).

Times each phase of the two-pass flow separately on the same inputs the
bench uses: host preprocess, pass-1 extract, per-sample MOTA masks, the
batched warp, pass-2 preprocess, pass-2 answer. Second iteration is the
honest one (first pays compiles).

Run:  PYTHONPATH=.:$PYTHONPATH python tools/profile_pipeline.py [mode] [batch]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.bench_utils import make_llava_7b_backend  # noqa: E402
from tools.make_random_7b_ckpt import build_dry_run_tokenizer  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+flash"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

backend, label = make_llava_7b_backend(MODE, tokenizer=build_dry_run_tokenizer())

from attwarp_tpu.extract.extraction import _resize_for_backend  # noqa: E402
from attwarp_tpu.pipeline import AttWarpPipeline, _to_float255  # noqa: E402
from attwarp_tpu.warp.blend import mota_mask  # noqa: E402
from attwarp_tpu.warp.warp import warp_batch_by_attention  # noqa: E402

pipe = AttWarpPipeline(backend, warp_size=500, max_new_tokens=20)
rng = np.random.default_rng(0)
questions = ["what is the text on the label?"] * B


def phases():
    images = [(rng.random((480, 640, 3)) * 255).astype(np.uint8)
              for _ in range(B)]
    t = {}
    t0 = time.perf_counter()
    batch_in = np.stack([_resize_for_backend(im, backend.image_size)
                         for im in images])
    t["preproc1"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    maps, ans1 = backend.extract(batch_in, questions, max_new_tokens=20)
    maps = np.asarray(maps)
    t["extract"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    imgs255 = [pipe._bucket_size(_to_float255(im)) for im in images]
    t["bucket"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    masks = [np.asarray(mota_mask(jnp.asarray(maps[b], jnp.float32),
                                  imgs255[b].shape[:2]))
             for b in range(B)]
    t["masks"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    warped = np.asarray(warp_batch_by_attention(
        jnp.asarray(np.stack(imgs255)),
        jnp.asarray(np.stack(masks), jnp.float32), 500, 500, pipe.params))
    t["warp"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    warped_in = np.stack([_resize_for_backend(w, backend.image_size)
                          for w in warped])
    t["preproc2"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ans2 = backend.answer_batch(warped_in, questions, max_new_tokens=20)
    t["answer"] = time.perf_counter() - t0
    assert len(ans2) == B
    return t


for it in range(2):
    t = phases()
    total = sum(t.values())
    print(f"iter {it}: total {total*1e3:8.0f} ms  " +
          "  ".join(f"{k} {v*1e3:.0f}" for k, v in t.items()))
