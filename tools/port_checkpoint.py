"""Port a HuggingFace MLLM checkpoint to a native orbax directory.

    PYTHONPATH=.:$PYTHONPATH python tools/port_checkpoint.py --family llava \
        --hf-path llava-hf/llava-1.5-7b-hf --out ckpts/llava-jax [--bf16]
    PYTHONPATH=.:$PYTHONPATH python tools/port_checkpoint.py --family qwen2vl \
        --hf-path Qwen/Qwen2-VL-7B-Instruct --out ckpts/qwen2vl-jax [--bf16]

The one-time port needs torch + transformers; afterwards the matching
backend's ``load(out_dir)`` restores the pure-JAX model with no torch
dependency. (``tools/port_llava.py`` remains as the LLaVA-only shorthand.)
"""

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("port-checkpoint")
    p.add_argument("--family", required=True, choices=["llava", "qwen2vl"])
    p.add_argument("--hf-path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--bf16", action="store_true",
                   help="store parameters in bfloat16 (halves size; 7B fits "
                        "one v5e chip)")
    p.add_argument("--int8", action="store_true",
                   help="quantize the text decoder to int8 (w8a8) before "
                        "saving — the checkpoint loads ready to serve "
                        "(combine with --bf16 for the non-decoder parts)")
    p.add_argument("--extract-layer", type=int, default=20)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    print(f"Loading HF checkpoint {args.hf_path} ...")
    if args.family == "llava":
        from attwarp_tpu.extract.llava_backend import LlavaBackend as Backend
    else:
        from attwarp_tpu.extract.qwen2vl_backend import Qwen2VLBackend as Backend
    backend = Backend.from_hf(
        args.hf_path, extract_layer=args.extract_layer, dtype=dtype
    )
    if args.int8:
        backend.quantize_int8()
    backend.save(args.out)
    print(
        f"Ported {args.family} to {args.out} (dtype={dtype.__name__}"
        f"{', decoder int8' if args.int8 else ''}). "
        f"Restore with {Backend.__name__}.load({args.out!r}); pass the HF "
        "tokenizer for the text-level extract API."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
