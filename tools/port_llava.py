"""Port a HuggingFace LLaVA checkpoint to a native orbax directory.

    PYTHONPATH=.:$PYTHONPATH python tools/port_llava.py \
        --hf-path llava-hf/llava-1.5-7b-hf \
        --out checkpoints/llava-1.5-7b-jax [--bf16]

The one-time port needs torch + transformers; afterwards
``LlavaBackend.load(out_dir)`` restores the pure-JAX model with no torch
dependency.
"""

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("port-llava")
    p.add_argument("--hf-path", required=True,
                   help="HF hub id or local checkpoint directory")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--bf16", action="store_true",
                   help="store parameters in bfloat16 (halves size; 7B fits "
                        "one v5e chip)")
    p.add_argument("--extract-layer", type=int, default=20)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from attwarp_tpu.extract.llava_backend import LlavaBackend

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    print(f"Loading HF checkpoint {args.hf_path} ...")
    backend = LlavaBackend.from_hf(
        args.hf_path, extract_layer=args.extract_layer, dtype=dtype
    )
    backend.save(args.out)
    print(
        f"Ported to {args.out} (dtype={dtype.__name__}). Restore with "
        f"LlavaBackend.load({args.out!r}) — pass the HF tokenizer for the "
        "text-level extract API (only params+config are stored natively)."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
