"""Qwen2-VL extraction backend.

Second model family behind the same duck-typed interface as the LLaVA and
mini backends. The reference's training artifacts came from a Qwen pipeline
(dataset roots ``*_qwen_multilayer``), so Qwen-class attention extraction is
a first-class path, not an ablation.

The attention-map side length follows the image: a ``size×size`` input gives
``(size / (patch*merge))²`` merged vision tokens (e.g. 448px -> 16×16); the
warp engine consumes any grid, so no 24×24 assumption leaks in.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax

from attwarp_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    Qwen2VLModel,
    Qwen2VLTextConfig,
    Qwen2VLVisionConfig,
    patchify_image,
    port_hf_qwen2vl_weights,
)

# Qwen2-VL processors normalize with the OPENAI CLIP statistics.
from attwarp_tpu.extract.llava_backend import _first_defined, _scalar_eos
from attwarp_tpu.models.clip_vit import CLIP_MEAN, CLIP_STD


class Qwen2VLBackend:
    def __init__(self, model: Qwen2VLModel, tokenizer=None,
                 extract_layer: int = 20, image_size: int = 448,
                 kv_quant: bool = False, use_flash: bool = False):
        self.model = model
        self.tokenizer = tokenizer
        self.extract_layer = extract_layer
        # int8 KV cache (CLI suffix '+kv8'): halves decode-cache HBM vs bf16,
        # roughly doubling serving batch capacity (numerics/quant.py)
        self.kv_quant = kv_quant
        # flash-attention prefill (CLI suffix '+flash'): the same Pallas
        # kernel as the LLaVA path — M-RoPE only changes cos/sin before
        # attention, so the kernel is shared (models/qwen2vl.py prefill)
        self.use_flash = use_flash
        # input side; must be divisible by patch*merge (28)
        unit = model.cfg.vision.patch_size * model.cfg.vision.spatial_merge_size
        assert image_size % unit == 0, (image_size, unit)
        n_layers = model.cfg.text.num_hidden_layers
        for l in ([extract_layer] if isinstance(extract_layer, int)
                  else extract_layer):
            if not 0 <= l < n_layers:
                raise ValueError(
                    f"extract_layer {l} out of range for "
                    f"{n_layers}-layer model"
                )
        self.image_size = image_size
        self.name = "qwen2vl-jax"

    @classmethod
    def from_hf(cls, model_path: str, extract_layer: int = 20,
                image_size: int = 448, dtype=None) -> "Qwen2VLBackend":
        import jax.numpy as jnp
        import torch
        from transformers import AutoProcessor, Qwen2VLForConditionalGeneration

        hf = Qwen2VLForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float32, low_cpu_mem_usage=True
        )
        try:
            tokenizer = AutoProcessor.from_pretrained(model_path).tokenizer
        except Exception as e:  # weights-only checkpoint: ids-level API still works
            print(f"[from_hf] no processor at {model_path} ({e}); "
                  "text-level extract disabled until a tokenizer is attached")
            tokenizer = None
        cfg = cls.config_from_hf(hf.config)
        params = port_hf_qwen2vl_weights(
            hf.state_dict(), cfg, dtype=dtype if dtype is not None else jnp.float32
        )
        del hf
        return cls(Qwen2VLModel(cfg, params), tokenizer=tokenizer,
                   extract_layer=extract_layer, image_size=image_size)

    # ── native checkpointing (port once, reload without torch) ─────────
    def save(self, path: str) -> None:
        import dataclasses
        import json
        from pathlib import Path

        import orbax.checkpoint as ocp

        p = Path(path).absolute()
        p.mkdir(parents=True, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(p / "params", jax.device_get(self.model.params), force=True)
        with open(p / "config.json", "w") as f:
            json.dump(dataclasses.asdict(self.model.cfg), f, indent=2)
        if self.tokenizer is not None:
            try:  # make the checkpoint dir self-contained for text-level use
                self.tokenizer.save_pretrained(str(p))
            except Exception as e:
                print(f"[save] tokenizer not persisted: {e}")

    @classmethod
    def load(cls, path: str, extract_layer: int = 20, image_size: int = 448,
             tokenizer=None) -> "Qwen2VLBackend":
        import json
        from pathlib import Path

        import orbax.checkpoint as ocp

        p = Path(path).absolute()
        with open(p / "config.json") as f:
            d = json.load(f)
        cfg = Qwen2VLConfig(
            vision=Qwen2VLVisionConfig(**d["vision"]),
            text=Qwen2VLTextConfig(
                **{**d["text"], "mrope_section": tuple(d["text"]["mrope_section"])}
            ),
            image_token_id=d["image_token_id"],
            vision_start_token_id=d["vision_start_token_id"],
            vision_end_token_id=d["vision_end_token_id"],
            pad_token_id=d["pad_token_id"],
            eos_token_id=d["eos_token_id"],
        )
        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(p / "params")
        if tokenizer is None:
            try:  # best-effort: checkpoints saved with a tokenizer carry it
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(str(p))
            except Exception:
                tokenizer = None
        return cls(Qwen2VLModel(cfg, params), tokenizer=tokenizer,
                   extract_layer=extract_layer, image_size=image_size)

    @staticmethod
    def config_from_hf(hf_cfg) -> Qwen2VLConfig:
        v, t = hf_cfg.vision_config, hf_cfg.text_config
        mrope = (t.rope_scaling or {}).get("mrope_section", [16, 24, 24])
        return Qwen2VLConfig(
            vision=Qwen2VLVisionConfig(
                depth=v.depth, embed_dim=v.embed_dim, hidden_size=v.hidden_size,
                num_heads=v.num_heads, in_channels=v.in_channels,
                patch_size=v.patch_size, spatial_merge_size=v.spatial_merge_size,
                temporal_patch_size=v.temporal_patch_size,
                mlp_ratio=v.mlp_ratio, hidden_act=v.hidden_act,
            ),
            text=Qwen2VLTextConfig(
                vocab_size=t.vocab_size, hidden_size=t.hidden_size,
                intermediate_size=t.intermediate_size,
                num_hidden_layers=t.num_hidden_layers,
                num_attention_heads=t.num_attention_heads,
                num_key_value_heads=t.num_key_value_heads,
                rms_norm_eps=t.rms_norm_eps, rope_theta=t.rope_theta,
                mrope_section=tuple(mrope),
            ),
            image_token_id=hf_cfg.image_token_id,
            vision_start_token_id=hf_cfg.vision_start_token_id,
            vision_end_token_id=getattr(hf_cfg, "vision_end_token_id", 151653),
            pad_token_id=_scalar_eos(
                _first_defined(
                    getattr(hf_cfg, "pad_token_id", None),
                    getattr(t, "eos_token_id", None),
                    151643,
                )
            ),
            eos_token_id=_scalar_eos(
                _first_defined(getattr(t, "eos_token_id", None), 151645)
            ),
        )

    def quantize_int8(self) -> "Qwen2VLBackend":
        """Quantize the text-decoder linears to int8 (w8a8) in place —
        halves/quarters decode-step HBM traffic vs bf16/f32 (decode is
        weight-bandwidth-bound). Embeddings, lm_head, norms, and the vision
        tower keep their original dtype. See ``numerics/quant.py``."""
        from attwarp_tpu.numerics.quant import quantize_decoder_params

        self.model.params["text"] = quantize_decoder_params(
            self.model.params["text"]
        )
        return self

    def quantize_lm_head(self) -> "Qwen2VLBackend":
        """int8 LM head (backend spec ``+lm8``): Qwen2-VL's 152k-vocab bf16
        head is 1.09 GB — the single largest per-decode-step HBM stream
        after the decoder linears, and the dense form's f32-upcast matmul
        streams 2.18 GB. int8 quarters the bf16 bytes. Logit precision
        moves — opt-in; see ``numerics/quant.py::lm_logits``."""
        from attwarp_tpu.numerics.quant import quantize_lm_head

        self.model.params["text"] = quantize_lm_head(
            self.model.params["text"]
        )
        return self

    @property
    def num_patches_side(self) -> int:
        unit = self.model.cfg.vision.patch_size * self.model.cfg.vision.spatial_merge_size
        return self.image_size // unit

    # ── ids-level extraction ────────────────────────────────────────────
    def extract_from_ids(
        self,
        input_ids: np.ndarray,       # (B, T) with expanded image tokens
        attention_mask: np.ndarray,  # (B, T)
        image: np.ndarray,           # (S, S, 3) shared or (B, S, S, 3)
        max_new_tokens: int = 20,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One jitted batched generate. ``image`` may be a single image
        shared across the batch, or one per sample (all the same (S, S)
        grid, which the fixed-size preprocessing guarantees)."""
        vcfg = self.model.cfg.vision
        if image.ndim == 4:
            per = [patchify_image(im, vcfg) for im in image]
            grid = per[0][1]
            patches = np.stack([p for p, _ in per])   # (B, N, C*T*P*P)
        else:
            patches, grid = patchify_image(image, vcfg)
        gen, maps = self.model.generate_with_attention(
            np.asarray(input_ids), patches, grid, np.asarray(attention_mask),
            extract_layer=self.extract_layer, max_new_tokens=max_new_tokens,
            kv_quant=self.kv_quant, use_flash=self.use_flash,
        )
        return np.asarray(gen), np.asarray(maps)

    # ── text-level extraction (needs a tokenizer) ───────────────────────
    def build_ids(self, question: str) -> List[int]:
        """One question -> unpadded expanded prompt ids (Qwen chat template:
        system turn, then the vision block inside the user turn bounded by
        <|vision_start|>/<|vision_end|>)."""
        if self.tokenizer is None:
            raise RuntimeError("Qwen2VLBackend needs a tokenizer "
                               "(from_hf); use extract_from_ids otherwise")
        cfg = self.model.cfg
        n_tok = self.num_patches_side ** 2
        prefix_ids = self.tokenizer(
            "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            "<|im_start|>user\n",
            add_special_tokens=False,
        )["input_ids"]
        suffix_ids = self.tokenizer(
            f"{question}<|im_end|>\n<|im_start|>assistant\n",
            add_special_tokens=False,
        )["input_ids"]
        return (
            prefix_ids
            + [cfg.vision_start_token_id]
            + [cfg.image_token_id] * n_tok
            + [cfg.vision_end_token_id]
            + suffix_ids
        )

    def _prepare(self, images, questions):
        """Chat prompts -> expanded+left-padded ids, mask, normalized images."""
        cfg = self.model.cfg
        from attwarp_tpu.extract.offsets import left_pad

        ids_list = [self.build_ids(q) for q in questions]
        padded, mask = left_pad(ids_list, pad_id=cfg.pad_token_id, bucket=64)
        imgs = np.stack([self._preprocess(images[b]) for b in range(len(images))])
        return np.asarray(padded), np.asarray(mask), imgs

    def _decode(self, gen: np.ndarray) -> List[str]:
        texts = []
        for row in gen:
            out = []
            for tok in row:
                if int(tok) == self.model.cfg.eos_token_id:
                    break
                out.append(int(tok))
            texts.append(self.tokenizer.decode(out, skip_special_tokens=True).strip())
        return texts

    def extract(
        self,
        images: np.ndarray,          # (B, H, W, 3)
        questions: Sequence[str],
        max_new_tokens: int = 20,
    ) -> Tuple[np.ndarray, List[str]]:
        # One batched prefill+decode (vmapped vision tower) — the per-sample
        # loop serialized B prefills even though all images share one grid.
        padded, mask, imgs = self._prepare(images, questions)
        gen, maps = self.extract_from_ids(padded, mask, imgs, max_new_tokens)
        return maps, self._decode(gen)

    def answer_batch(
        self,
        images: np.ndarray,
        questions: Sequence[str],
        max_new_tokens: int = 64,
    ) -> List[str]:
        """Answer-only fast path (``extract_layer=None``): no attention
        probabilities materialized, no accumulator scanned — eval answering
        skips all extraction work."""
        padded, mask, imgs = self._prepare(images, questions)
        vcfg = self.model.cfg.vision
        per = [patchify_image(im, vcfg) for im in imgs]
        patches = np.stack([p for p, _ in per])
        gen, _ = self.model.generate_with_attention(
            padded, patches, per[0][1], mask,
            extract_layer=None, max_new_tokens=max_new_tokens,
            kv_quant=self.kv_quant, use_flash=self.use_flash,
        )
        return self._decode(np.asarray(gen))

    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        from attwarp_tpu.extract.extraction import _resize_for_backend

        img = _resize_for_backend(image, self.image_size)
        return np.asarray((img - CLIP_MEAN) / CLIP_STD, np.float32)


