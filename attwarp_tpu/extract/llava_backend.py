"""Real-weights LLaVA extraction backend.

Wraps ``attwarp_tpu.models.llava`` (the JAX LLaVA, HF-weight-ported and
parity-tested) behind the same duck-typed interface as the mini test
backend: ``extract(images, questions) -> (maps (B, 24, 24), texts)``.

Loading goes through transformers only for checkpoint IO + tokenization:

    backend = LlavaBackend.from_hf("llava-hf/llava-1.5-7b-hf")

In a zero-egress environment the checkpoint must already be on disk (a local
path works the same way). The ids-level API (``extract_from_ids``) has no
tokenizer dependency and is what the drivers use after their own prompt
assembly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.extract.prompts import build_prompt
from attwarp_tpu.models.clip_vit import CLIP_MEAN, CLIP_STD, ClipVisionConfig
from attwarp_tpu.models.llama import LlamaConfig
from attwarp_tpu.models.llava import LlavaConfig, LlavaModel, port_hf_llava_weights


def _scalar_eos(eos) -> int:
    """HF checkpoints may define eos_token_id as a list (e.g. [2, 32000]);
    the frozen jit-static config needs one hashable int — take the first."""
    if isinstance(eos, (list, tuple)):
        eos = eos[0] if eos else 2
    return int(eos) if eos is not None else 2


def _first_defined(*vals):
    """First non-None value. 0 is a legitimate token id, so this must not be
    a truthiness or-chain."""
    for v in vals:
        if v is not None:
            return v
    return None


@jax.jit
def _clip_normalize_device(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP normalization of an already-resized [0,1] batch ON DEVICE — the
    fast path for callers that keep pixels device-resident (AttWarpPipeline)
    instead of paying a host round trip per image."""
    return (x - jnp.asarray(CLIP_MEAN, jnp.float32)) / jnp.asarray(
        CLIP_STD, jnp.float32
    )


class LlavaBackend:
    # `_prepare` accepts a device-resident (B, image_size, image_size, C)
    # [0,1] float batch in place of raw host images (see AttWarpPipeline)
    supports_device_pixels = True

    def __init__(self, model: LlavaModel, tokenizer=None, image_processor=None,
                 extract_layer: int = 20, use_flash: bool = False,
                 kv_quant: bool = False):
        self.model = model
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.extract_layer = extract_layer
        # flash-attention prefill (Pallas kernel; enable on TPU for long
        # prompts — the 576-image-token prefill is the dominant cost)
        self.use_flash = use_flash
        # int8 KV cache (CLI suffix '+kv8'): halves decode-cache HBM vs bf16,
        # roughly doubling serving batch capacity (numerics/quant.py)
        self.kv_quant = kv_quant
        self.name = "llava-jax"

    # ── loading ────────────────────────────────────────────────────────
    @classmethod
    def from_hf(
        cls, model_path: str, extract_layer: int = 20, dtype=None
    ) -> "LlavaBackend":
        """Load an HF LLaVA checkpoint (local path or hub id) and port it.
        ``dtype=jnp.bfloat16`` halves serving HBM (7B fits one v5e)."""
        import torch
        from transformers import AutoProcessor, LlavaForConditionalGeneration

        hf = LlavaForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float32, low_cpu_mem_usage=True
        )
        try:
            processor = AutoProcessor.from_pretrained(model_path)
            tokenizer, image_processor = processor.tokenizer, processor.image_processor
        except Exception as e:  # weights-only checkpoint: ids-level API still works
            print(f"[from_hf] no processor at {model_path} ({e}); "
                  "text-level extract disabled until a tokenizer is attached")
            tokenizer = image_processor = None
        cfg = cls.config_from_hf(hf.config)
        params = port_hf_llava_weights(
            hf.state_dict(), cfg, dtype=dtype if dtype is not None else jnp.float32
        )
        del hf
        return cls(
            LlavaModel(cfg, params),
            tokenizer=tokenizer,
            image_processor=image_processor,
            extract_layer=extract_layer,
        )

    # ── native checkpointing (port from HF once, reload via orbax) ─────
    def save(self, path: str) -> None:
        """Persist the ported params (orbax) + config (json) so future runs
        skip the torch/HF load entirely."""
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
    def load(cls, path: str, extract_layer: int = 20, tokenizer=None) -> "LlavaBackend":
        """Restore a backend saved with ``save`` (no torch/transformers
        needed; pass a tokenizer for the text-level ``extract`` API)."""
        import json
        from pathlib import Path

        import orbax.checkpoint as ocp

        p = Path(path).absolute()
        with open(p / "config.json") as f:
            d = json.load(f)
        cfg = LlavaConfig(
            vision=ClipVisionConfig(**d["vision"]),
            text=LlamaConfig(**d["text"]),
            vision_feature_layer=d["vision_feature_layer"],
            projector_act=d["projector_act"],
            image_token_index=d["image_token_index"],
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
        return cls(LlavaModel(cfg, params), tokenizer=tokenizer,
                   extract_layer=extract_layer)

    @staticmethod
    def config_from_hf(hf_cfg) -> LlavaConfig:
        v, t = hf_cfg.vision_config, hf_cfg.text_config
        return LlavaConfig(
            vision=ClipVisionConfig(
                hidden_size=v.hidden_size,
                intermediate_size=v.intermediate_size,
                num_hidden_layers=v.num_hidden_layers,
                num_attention_heads=v.num_attention_heads,
                image_size=v.image_size,
                patch_size=v.patch_size,
                hidden_act=getattr(v, "hidden_act", "quick_gelu"),
            ),
            text=LlamaConfig(
                vocab_size=t.vocab_size,
                hidden_size=t.hidden_size,
                intermediate_size=t.intermediate_size,
                num_hidden_layers=t.num_hidden_layers,
                num_attention_heads=t.num_attention_heads,
                num_key_value_heads=getattr(t, "num_key_value_heads", None),
                rms_norm_eps=getattr(t, "rms_norm_eps", 1e-5),
                rope_theta=getattr(t, "rope_theta", 10000.0),
            ),
            vision_feature_layer=getattr(hf_cfg, "vision_feature_layer", -2),
            image_token_index=hf_cfg.image_token_index,
            pad_token_id=_scalar_eos(
                _first_defined(
                    getattr(hf_cfg, "pad_token_id", None),
                    getattr(hf_cfg.text_config, "eos_token_id", 2),
                )
            ),
            eos_token_id=_scalar_eos(getattr(hf_cfg.text_config, "eos_token_id", 2)),
        )

    def quantize_int8(self) -> "LlavaBackend":
        """Quantize the LLaMA-decoder linears to int8 (w8a8) in place —
        halves/quarters decode-step HBM traffic vs bf16/f32 (decode is
        weight-bandwidth-bound). Embeddings, lm_head, norms, projector, and
        the CLIP tower keep their original dtype. See ``numerics/quant.py``."""
        from attwarp_tpu.numerics.quant import quantize_decoder_params

        self.model.params["llama"] = quantize_decoder_params(
            self.model.params["llama"]
        )
        return self

    def quantize_lm_head(self) -> "LlavaBackend":
        """int8 LM head (backend spec ``+lm8``): quantize the logits matmul
        weight. At 7B this halves the ~0.26 GB bf16 head stream per decode
        step (and quarters the 2x-widened f32 stream the dense form's
        upcast matmul actually reads). Logit precision moves — opt-in; see
        ``numerics/quant.py::lm_logits``."""
        from attwarp_tpu.numerics.quant import quantize_lm_head

        self.model.params["llama"] = quantize_lm_head(
            self.model.params["llama"]
        )
        return self

    # ── properties ─────────────────────────────────────────────────────
    @property
    def image_size(self) -> int:
        return self.model.cfg.vision.image_size

    @property
    def num_patches_side(self) -> int:
        return self.model.cfg.vision.image_size // self.model.cfg.vision.patch_size

    # ── ids-level extraction (no tokenizer needed) ─────────────────────
    def extract_from_ids(
        self,
        input_ids: np.ndarray,       # (B, T) HF-expanded image tokens, left-padded
        attention_mask: np.ndarray,  # (B, T)
        pixel_values: np.ndarray,    # (B, S, S, 3) CLIP-normalized NHWC
        max_new_tokens: int = 20,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (generated ids (B, K), attention maps (B, n, n))."""
        ids = np.asarray(input_ids)
        img_start = np.argmax(ids == self.model.cfg.image_token_index, axis=1)
        gen, maps = self.model.generate_with_attention(
            jnp.asarray(ids),
            jnp.asarray(pixel_values, jnp.float32),
            jnp.asarray(attention_mask, bool),
            jnp.asarray(img_start, jnp.int32),
            extract_layer=self.extract_layer,
            max_new_tokens=max_new_tokens,
            use_flash=self.use_flash,
            kv_quant=self.kv_quant,
        )
        return np.asarray(gen), np.asarray(maps)

    # ── full extraction (needs tokenizer + image processor) ────────────
    def build_ids(self, question: str) -> List[int]:
        """One question -> unpadded expanded prompt ids (llava_v1 template,
        <image> expanded to num_image_tokens ids, HF style)."""
        if self.tokenizer is None:
            raise RuntimeError(
                "LlavaBackend needs a tokenizer; load via from_hf or "
                "use extract_from_ids."
            )
        pre, post = build_prompt(question, "llava_v1").split("<image>")
        return (
            self.tokenizer(pre, add_special_tokens=True)["input_ids"]
            + [self.model.cfg.image_token_index] * self.model.cfg.num_image_tokens
            + self.tokenizer(post, add_special_tokens=False)["input_ids"]
        )

    def _prepare(self, images, questions):
        """Prompts -> expanded+left-padded ids, mask, CLIP-normalized pixels."""
        ids_list = [self.build_ids(q) for q in questions]
        from attwarp_tpu.extract.offsets import left_pad

        # bucketed padding: one compilation per 64-token length bucket
        padded, mask = left_pad(
            ids_list, pad_id=self.model.cfg.pad_token_id, bucket=64
        )
        if (
            isinstance(images, jnp.ndarray)
            and images.ndim == 4
            and images.shape[1] == images.shape[2] == self.image_size
        ):
            # Device-resident pre-resized batch: normalize on device, skip
            # the per-image host preprocess entirely. Integer batches are
            # scaled by the dtype rule; FLOAT device batches must already be
            # [0,1] (the resize_images_batch / resize_scale_device contract)
            # — a float 0-255 device array can't be detected without a host
            # sync, so that case is the caller's bug, not silently guessed.
            x = images
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.float32) / 255.0
            pixels = _clip_normalize_device(x)
        else:
            pixels = np.stack([self._preprocess(im) for im in images])
        return np.asarray(padded), np.asarray(mask), pixels

    def _decode(self, gen: np.ndarray) -> List[str]:
        texts = []
        for row in gen:
            out = []
            for t in row:
                if int(t) == self.model.cfg.eos_token_id:
                    break
                out.append(int(t))
            texts.append(self.tokenizer.decode(out, skip_special_tokens=True).strip())
        return texts

    def extract(
        self,
        images: np.ndarray,          # (B, H, W, 3) float [0,1] or uint8
        questions: Sequence[str],
        max_new_tokens: int = 20,
    ) -> Tuple[np.ndarray, List[str]]:
        padded, mask, pixels = self._prepare(images, questions)
        gen, maps = self.extract_from_ids(padded, mask, pixels, max_new_tokens)
        return maps, self._decode(gen)

    def answer_batch(
        self,
        images: np.ndarray,
        questions: Sequence[str],
        max_new_tokens: int = 64,
    ) -> List[str]:
        """Answer-only fast path: greedy generate with ``extract_layer=None``
        — no layer materializes attention probabilities and no accumulator is
        scanned, so eval answering skips all extraction work (the reference
        harness pays a full hooked generate per answer,
        evaluate_accuracy.py:275-473)."""
        padded, mask, pixels = self._prepare(images, questions)
        img_start = np.argmax(padded == self.model.cfg.image_token_index, axis=1)
        gen, _ = self.model.generate_with_attention(
            jnp.asarray(padded),
            jnp.asarray(pixels, jnp.float32),
            jnp.asarray(mask, bool),
            jnp.asarray(img_start, jnp.int32),
            extract_layer=None,
            max_new_tokens=max_new_tokens,
            use_flash=self.use_flash,
            kv_quant=self.kv_quant,
        )
        return self._decode(np.asarray(gen))

    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        from attwarp_tpu.extract.extraction import _resize_for_backend

        img = _resize_for_backend(image, self.image_size)
        return np.asarray((img - CLIP_MEAN) / CLIP_STD, np.float32)
