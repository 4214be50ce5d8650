"""Generate the synthetic code-tag VQA dataset (TextVQA_0.5.1 layout).

Closes BASELINE target 3's evidence chain without real MLLM weights: scenes
where attention demonstrably matters (an 8x8-bit code tag too small to read
at the model input resolution), processed by the REAL driver + eval harness:

    python tools/make_codetag_dataset.py out/codetag --n 50
    python -m attwarp_tpu.cli.process_dataset \
        --textvqa-json out/codetag/codetag_val.json \
        --image-dir out/codetag/images --output-dir out/codetag/processed \
        --backend reader
    python -m attwarp_tpu.cli.evaluate \
        --metadata-dir out/codetag/processed/metadata \
        --output-dir out/codetag/eval --model reader --score-original
"""
import argparse

from attwarp_tpu.testing.reader import write_textvqa_dataset


def main(argv=None) -> int:
    p = argparse.ArgumentParser("Generate the synthetic code-tag VQA dataset")
    p.add_argument("out_dir")
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--src", type=int, default=512, help="scene resolution")
    p.add_argument("--geometry", choices=("center", "hard"), default="center",
                   help="'hard' = off-center varying-scale tag among "
                        "high-contrast distractors (VERDICT r4 item 7)")
    args = p.parse_args(argv)
    json_path, image_dir = write_textvqa_dataset(
        args.out_dir, n=args.n, seed=args.seed, src=args.src,
        geometry=args.geometry,
    )
    print(f"wrote {args.n} samples: {json_path} (images in {image_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
