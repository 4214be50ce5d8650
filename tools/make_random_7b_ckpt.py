"""Create a RANDOM-weights LLaVA-1.5-7B-shape orbax checkpoint.

The dry-run half of ``tools/run_textvqa_7b.sh``: in a zero-egress
environment the real ``llava-hf/llava-1.5-7b-hf`` download is the ONLY
untestable step, so this builds a checkpoint with the exact same geometry
(CLIP-L/14-336 vision tower, 32-layer 4096-wide LLaMA decoder, 32064-token
vocab, image token 32000) and a self-contained word-level fast tokenizer,
letting every downstream command — ``LlavaBackend.load``,
``cli.process_dataset --backend llava-ckpt:…+int8+flash``,
``cli.evaluate --serve-slots N`` — run at true 7B shape with no network.

Run on CPU (the host has RAM for the f32 RNG; the checkpoint is stored
bf16, ~13.6 GiB):

    JAX_PLATFORMS=cpu PYTHONPATH=.:$PYTHONPATH \
        python tools/make_random_7b_ckpt.py --out /path/to/ckpt
"""

import argparse


def build_dry_run_tokenizer():
    """A self-contained LLaMA-style fast tokenizer (word-level, built
    programmatically — no downloads). Vocab ids stay far below 32000 so
    nothing collides with the image token; unknown words map to <unk>."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    words = (
        "<unk> <s> </s>".split()
        + list("abcdefghijklmnopqrstuvwxyz0123456789")
        + list(".,:;?!'\"()-")
        + ("USER ASSISTANT A chat between a curious human and an artificial "
           "intelligence assistant . The gives helpful detailed polite "
           "answers to the user s questions what is shown here read label "
           "text code on tag in image Answer single word or key phrase").split()
    )
    vocab = {}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", vocab["<s>"])],
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<unk>",
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser("make-random-7b-ckpt")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    # Always build on CPU: the f32 RNG tree is ~28 GiB (host RAM territory),
    # and the session's sitecustomize preloads jax with the TPU platform, so
    # the env var alone doesn't stick (CLAUDE.md) — pin it via config too.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as g
    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.models import LlamaConfig, LlavaConfig, LlavaModel

    # llava-hf/llava-1.5-7b-hf geometry: default ClipVisionConfig is
    # CLIP-L/14-336; default LlamaConfig is the 7B decoder; HF's text vocab
    # is padded to 32064 with the image placeholder at 32000
    cfg = LlavaConfig(text=LlamaConfig(vocab_size=32064),
                      image_token_index=32000)
    print("Generating random 7B-shape parameters (f32 on host) ...")
    params = g._random_llava_params(cfg, jax.random.PRNGKey(args.seed))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )
    backend = LlavaBackend(LlavaModel(cfg, params),
                           tokenizer=build_dry_run_tokenizer())
    print(f"Saving bf16 orbax checkpoint to {args.out} ...")
    backend.save(args.out)
    print("Done. Restore with LlavaBackend.load (tokenizer included).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
