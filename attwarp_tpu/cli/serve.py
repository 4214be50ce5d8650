"""Batch-serving CLI: answer a stream of (image, question) requests through
the continuous-batching engine.

The product surface over ``attwarp_tpu.serving.ServeEngine``: load any real
backend spec (same grammar as the driver, incl. ``+int8``/``+kv8``), read a
JSONL of ``{"image_path": ..., "question": ...}`` requests, stream them
through the slot pool, and write ``{"question", "answer", "tokens"}`` JSONL.
The reference framework has no serving entry point at all.

    python -m attwarp_tpu.cli.serve \
        --backend llava-ckpt:/ckpt+int8+kv8 \
        --jsonl requests.jsonl --output answers.jsonl \
        --slots 8 --max-seq 768 --max-new-tokens 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional, Sequence

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Continuous-batching MLLM serving")
    p.add_argument("--backend", required=True,
                   help="'llava:<path>', 'llava-ckpt:<dir>', 'qwen2vl:<path>',"
                        " 'qwen2vl-ckpt:<dir>' (+int8/+kv8/+lm8 suffixes"
                        " compose); the mini test backend has no serving path")
    p.add_argument("--jsonl", required=True,
                   help="requests: one {image_path?, question} per line; "
                        "ids-level clients may pass {input_ids: [...]} "
                        "instead of question (no tokenizer needed)")
    p.add_argument("--output", required=True, help="answers JSONL")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-seq", type=int, default=768)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--steps-per-tick", type=int, default=8)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy; >0 samples (per-request 'temperature' "
                        "fields in the JSONL override)")
    p.add_argument("--top-k", type=int, default=0,
                   help="truncate sampling to the k most likely tokens")
    p.add_argument("--seed", type=int, default=0,
                   help="sampling seed (per-request keys derive from it)")
    p.add_argument("--chunked-prefill", type=int, default=0, metavar="P",
                   help="admit prompts in P-token chunks riding the decode "
                        "ticks (ChunkedPrefillEngine) instead of dedicated "
                        "prefill programs; 0 = monolithic admission")
    p.add_argument("--limit", type=int, default=None)
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    from attwarp_tpu.cli import pin_platform

    pin_platform()
    args = build_parser().parse_args(argv)
    from attwarp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from attwarp_tpu.cli.process_dataset import make_backend
    from attwarp_tpu.serving import ChunkedPrefillEngine, ServeEngine

    backend = make_backend(args.backend, layer_index=0)
    if not hasattr(backend, "build_ids"):
        raise SystemExit(f"backend {args.backend!r} has no serving path")
    kv_quant = bool(getattr(backend, "kv_quant", False))
    kw = dict(slots=args.slots, max_seq=args.max_seq, kv_quant=kv_quant,
              steps_per_tick=args.steps_per_tick, top_k=args.top_k,
              seed=args.seed)
    if args.chunked_prefill:
        engine = ChunkedPrefillEngine(
            backend.model, prefill_chunk=args.chunked_prefill, **kw)
    else:
        engine = ServeEngine(
            backend.model,
            use_flash=bool(getattr(backend, "use_flash", False)), **kw)

    requests = []
    with open(args.jsonl) as f:
        for line in f:
            line = line.strip()
            if line:
                requests.append(json.loads(line))
    if args.limit:
        requests = requests[: args.limit]

    from PIL import Image

    rid_to_req = {}
    t0 = time.time()
    for req in requests:
        if "input_ids" in req:
            ids = np.asarray(req["input_ids"], np.int64)
        else:
            ids = np.asarray(backend.build_ids(req["question"]), np.int64)
        pixels = None
        if req.get("image_path"):
            with Image.open(req["image_path"]) as im:
                pixels = backend._preprocess(np.asarray(im.convert("RGB")))
        rid = engine.submit(
            ids, pixels, max_new_tokens=args.max_new_tokens,
            temperature=float(req.get("temperature", args.temperature)),
        )
        rid_to_req[rid] = req
    results = engine.run()
    dt = time.time() - t0

    n_tok = 0
    with open(args.output, "w") as f:
        for rid, req in rid_to_req.items():
            toks = results[rid]
            n_tok += len(toks)
            if toks and toks[-1] == backend.model.cfg.eos_token_id:
                toks = toks[:-1]
            if backend.tokenizer is not None:
                answer = backend.tokenizer.decode(
                    toks, skip_special_tokens=True
                ).strip()
            else:
                answer = None  # tokens-only checkpoint: ids still returned
            f.write(json.dumps({"question": req.get("question"),
                                "answer": answer, "tokens": toks}) + "\n")
    print(f"served {len(requests)} requests / {n_tok} tokens in {dt:.1f}s "
          f"({n_tok / max(dt, 1e-9):.1f} tok/s) -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
