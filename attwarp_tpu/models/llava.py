"""LLaVA-1.5 in functional JAX: CLIP tower -> MLP projector -> LLaMA.

This is the L1 layer the reference delegates to the vendored LLaVA repo
(SURVEY §1; every consumer imports ``llava.model.builder`` etc.). Here it is
a pure-JAX model whose weights port 1:1 from any HuggingFace
``LlavaForConditionalGeneration`` checkpoint (``port_hf_llava_weights``),
verified numerically against transformers at small scale in
``tests/test_llava_parity.py``.

Attention extraction is functional: ``generate_with_attention`` mirrors the
reference's hook cadence (prefill last-row + each decode step,
llava.py:93-132) via the scan-carried accumulator, with only the designated
layer materializing attention probabilities.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.extract.accumulator import accumulate_step, finalize, init_carry
from attwarp_tpu.models.clip_vit import (
    ClipVisionConfig,
    clip_vision_features,
)
from attwarp_tpu.models.llama import (
    LlamaConfig,
    llama_decode_step,
    make_decode_prep,
    llama_prefill,
)


@dataclass(frozen=True)
class LlavaConfig:
    vision: ClipVisionConfig = field(default_factory=ClipVisionConfig)
    text: LlamaConfig = field(default_factory=LlamaConfig)
    vision_feature_layer: int = -2
    projector_act: str = "gelu"
    image_token_index: int = 32000
    pad_token_id: int = 2
    eos_token_id: int = 2

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches


def _gelu(x: jnp.ndarray, name: str) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=(name != "gelu"))


def encode_images(params, cfg: LlavaConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """CLIP-normalized (B, S, S, 3) -> projected (B, 576, D_text)."""
    feats = clip_vision_features(
        params["vision"],
        cfg.vision,
        pixel_values,
        feature_layer=cfg.vision_feature_layer,
        drop_cls=True,
    )
    p = params["projector"]
    h = _gelu(feats @ p["linear_1"]["weight"].T + p["linear_1"]["bias"],
              cfg.projector_act)
    return h @ p["linear_2"]["weight"].T + p["linear_2"]["bias"]


def embed_and_splice(
    params, cfg: LlavaConfig, input_ids: jnp.ndarray, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """HF-expanded convention: ``input_ids`` already contains
    ``num_image_tokens`` occurrences of ``image_token_index`` per sample;
    their embeddings are replaced by projected image features in order."""
    ids = jnp.asarray(input_ids)
    emb = params["llama"]["embed_tokens"][jnp.clip(ids, 0, None)]
    img = encode_images(params, cfg, pixel_values).astype(emb.dtype)  # (B, N, D)
    is_img = ids == cfg.image_token_index
    # position of each image token among its sample's image tokens
    order = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
    order = jnp.clip(order, 0, img.shape[1] - 1)
    img_at = jnp.take_along_axis(img, order[..., None], axis=1)
    return jnp.where(is_img[..., None], img_at, emb)


class LlavaModel:
    """Parameter pytree + pure forward functions."""

    def __init__(self, cfg: LlavaConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params

    def encode_images(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        return encode_images(self.params, self.cfg, pixel_values)

    def embed_and_splice(self, input_ids, pixel_values) -> jnp.ndarray:
        return embed_and_splice(self.params, self.cfg, input_ids, pixel_values)

    def forward_logits(
        self,
        input_ids: jnp.ndarray,        # (B, T) with expanded image tokens
        pixel_values: jnp.ndarray,     # (B, S, S, 3)
        attention_mask: Optional[jnp.ndarray] = None,
        extract_layer: Optional[int] = None,
        use_flash: bool = False,
    ):
        """Returns (last-position logits, extract-layer last-row attention)."""
        B, T = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), bool)
        embeds = self.embed_and_splice(input_ids, pixel_values)
        logits, _kv, row = llama_prefill(
            self.params["llama"], self.cfg.text, embeds, attention_mask,
            max_seq=T, extract_layer=extract_layer, use_flash=use_flash,
        )
        return logits, row

    def generate_with_attention(
        self,
        input_ids: jnp.ndarray,       # (B, T) expanded, left-padded
        pixel_values: jnp.ndarray,    # (B, S, S, 3)
        attention_mask: jnp.ndarray,  # (B, T) bool
        img_start: jnp.ndarray,       # (B,) image-token span starts
        extract_layer=20,
        max_new_tokens: int = 20,
        use_flash: bool = False,
        kv_quant: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy decode; returns (generated ids (B, K), attention (B, n, n)).

        ``extract_layer`` may be an int or a sequence of ints; a sequence
        extracts every listed layer in the SAME pass and the attention comes
        back as (L, B, n, n) in the given order (one generate instead of L).
        ``extract_layer=None`` is the answer-only fast path: no layer ever
        materializes attention probabilities and no accumulator is carried —
        the attention result is None (used by the eval harness, which needs
        text answers, not maps).
        ``use_flash`` enables the Pallas flash-attention prefill (TPU only).
        ``kv_quant`` stores the KV cache int8 (half the bf16 HBM; decode
        batch capacity roughly doubles — numerics/quant.py::quantize_kv)."""
        if extract_layer is not None and not isinstance(extract_layer, int):
            extract_layer = tuple(extract_layer)
        return _generate_jit(
            self.params, self.cfg, input_ids, pixel_values, attention_mask,
            img_start, extract_layer, max_new_tokens, use_flash, kv_quant,
        )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "extract_layer", "max_new_tokens", "use_flash", "kv_quant"
    ),
)
def _generate_jit(
    params,
    cfg: LlavaConfig,
    input_ids,
    pixel_values,
    attention_mask,
    img_start,
    extract_layer: int,
    max_new_tokens: int,
    use_flash: bool = False,
    kv_quant: bool = False,
):
    tcfg = cfg.text
    B, T = input_ids.shape
    max_seq = T + max_new_tokens
    if kv_quant:
        # round the cache to a multiple of 64 so the Pallas flash-decoding
        # kernel's seq-tile gate holds (ops/pallas_decode_attn.py: any
        # 64-multiple carries a legal 32-multiple tile; T+max_new rarely
        # does). The extra slots stay masked off.
        max_seq = -(-max_seq // 64) * 64
    n_img = cfg.num_image_tokens
    side = int(np.sqrt(n_img))
    answer_only = extract_layer is None
    multi = not answer_only and not isinstance(extract_layer, int)

    def acc(carry, row):
        if answer_only:  # no accumulator carried at all
            return carry
        if multi:  # row (L, B, H, T): one accumulator per extracted layer
            return jax.vmap(
                lambda c, r: accumulate_step(c, r, img_start, jnp.ones((B,)), n_img)
            )(carry, row)
        return accumulate_step(carry, row, img_start, jnp.ones((B,)), n_img)

    def carry_init():
        if answer_only:
            return None
        c = init_carry(B, n_img)
        if multi:
            L = len(extract_layer)
            c = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (L, *x.shape)), c
            )
        return c

    embeds = embed_and_splice(params, cfg, input_ids, pixel_values)
    logits, kv, row0 = llama_prefill(
        params["llama"], tcfg, embeds, attention_mask,
        max_seq=max_seq, extract_layer=extract_layer, use_flash=use_flash,
        kv_quant=kv_quant,
    )
    carry0 = acc(carry_init(), row0)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    finished0 = tok0 == cfg.eos_token_id
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)  # (B,)
    full_mask = jnp.pad(attention_mask, ((0, 0), (0, max_seq - T)))

    def body(state, step):
        tok, kv, prep, finished, carry, full_mask = state
        cur_len = T + step
        full_mask = full_mask.at[:, cur_len].set(True)
        positions = lengths + step  # rope positions continue per sample
        emb = params["llama"]["embed_tokens"][tok][:, None, :]
        if prep is None:
            logits, kv, row = llama_decode_step(
                params["llama"], tcfg, emb, kv, cur_len, positions,
                full_mask, extract_layer=extract_layer,
            )
        else:
            logits, kv, row, prep = llama_decode_step(
                params["llama"], tcfg, emb, kv, cur_len, positions,
                full_mask, extract_layer=extract_layer, prep=prep,
            )
        # reference parity: BatchMaskHookLogger accumulates EVERY generation
        # step, including rows produced after a sample emitted EOS (HF
        # generate keeps forwarding finished rows; llava.py:384-411)
        carry = acc(carry, row)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # finished sequences continue with PAD, matching HF generate (which
        # falls back to eos when the checkpoint defines no pad token)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        finished = jnp.logical_or(finished, nxt == cfg.eos_token_id)
        return (nxt, kv, prep, finished, carry, full_mask), tok

    # With the flash-decoding kernel in the body, the while-loop carry
    # boundary copies the whole int8 cache 4x per crossing (the custom-call
    # reads defeat XLA's in-place carry aliasing; measured +78 ms/step at
    # 7B B=16). Unrolling amortizes the boundary: inside the straight-line
    # unrolled block the read-then-append chain stays in place (the same
    # reason tools/bench_decode.py unrolls). The carried ``prep`` pays the
    # kernel's scale relayout once per chain, not per step.
    unroll = min(8, max_new_tokens) if kv_quant else 1
    prep0 = make_decode_prep(kv)
    (_, _, _, _, carry, _), toks = jax.lax.scan(
        body,
        (tok0, kv, prep0, finished0, carry0, full_mask),
        jnp.arange(max_new_tokens, dtype=jnp.int32),
        unroll=unroll,
    )
    if answer_only:
        maps = None
    elif multi:
        maps = jax.vmap(lambda c: finalize(c, side))(carry)
    else:
        maps = finalize(carry, side)
    return jnp.moveaxis(toks, 0, 1), maps


# ── HF weight porting ──────────────────────────────────────────────────


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, np.float32)


def port_hf_llava_weights(
    state_dict: Dict[str, Any], cfg: LlavaConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Port a HuggingFace ``LlavaForConditionalGeneration`` state dict into
    the functional parameter pytree. Accepts both pre- and post-4.52 key
    layouts (``language_model.model.*`` vs ``model.language_model.*``).

    ``dtype=jnp.bfloat16`` halves HBM for serving (a 7B checkpoint fits a
    single v5e chip); norms/softmax/logits still compute in f32 internally.
    """
    sd = { _strip_prefix(k): v for k, v in state_dict.items() }

    def get(key: str) -> np.ndarray:
        return _np(sd[key])

    # vision tower
    vt = "vision_tower.vision_model."
    # The patch conv weight is (hidden, 3, P, P); our unfold layout is
    # (P, P, 3) flattened -> reorder to (hidden, P, P, 3) before reshaping.
    _pw = _np(sd[vt + "embeddings.patch_embedding.weight"])
    vparams: Dict[str, Any] = {
        "patch_weight": np.transpose(_pw, (0, 2, 3, 1)).reshape(_pw.shape[0], -1),
        "class_embedding": get(vt + "embeddings.class_embedding"),
        "position_embedding": get(vt + "embeddings.position_embedding.weight"),
        "pre_layrnorm": {
            "weight": get(vt + "pre_layrnorm.weight"),
            "bias": get(vt + "pre_layrnorm.bias"),
        },
        "layers": [],
    }
    for i in range(cfg.vision.num_hidden_layers):
        b = f"{vt}encoder.layers.{i}."
        vparams["layers"].append(
            {
                "layer_norm1": {"weight": get(b + "layer_norm1.weight"), "bias": get(b + "layer_norm1.bias")},
                "layer_norm2": {"weight": get(b + "layer_norm2.weight"), "bias": get(b + "layer_norm2.bias")},
                "q_proj": {"weight": get(b + "self_attn.q_proj.weight"), "bias": get(b + "self_attn.q_proj.bias")},
                "k_proj": {"weight": get(b + "self_attn.k_proj.weight"), "bias": get(b + "self_attn.k_proj.bias")},
                "v_proj": {"weight": get(b + "self_attn.v_proj.weight"), "bias": get(b + "self_attn.v_proj.bias")},
                "out_proj": {"weight": get(b + "self_attn.out_proj.weight"), "bias": get(b + "self_attn.out_proj.bias")},
                "fc1": {"weight": get(b + "mlp.fc1.weight"), "bias": get(b + "mlp.fc1.bias")},
                "fc2": {"weight": get(b + "mlp.fc2.weight"), "bias": get(b + "mlp.fc2.bias")},
            }
        )

    # projector
    proj = {
        "linear_1": {
            "weight": get("multi_modal_projector.linear_1.weight"),
            "bias": get("multi_modal_projector.linear_1.bias"),
        },
        "linear_2": {
            "weight": get("multi_modal_projector.linear_2.weight"),
            "bias": get("multi_modal_projector.linear_2.bias"),
        },
    }

    # language model
    lm = "language_model.model."
    lparams: Dict[str, Any] = {
        "embed_tokens": get(lm + "embed_tokens.weight"),
        "norm": get(lm + "norm.weight"),
        "layers": [],
    }
    if "language_model.lm_head.weight" in sd:
        lparams["lm_head"] = get("language_model.lm_head.weight")
    elif "lm_head.weight" in sd:
        lparams["lm_head"] = get("lm_head.weight")
    for i in range(cfg.text.num_hidden_layers):
        b = f"{lm}layers.{i}."
        lparams["layers"].append(
            {
                "input_layernorm": get(b + "input_layernorm.weight"),
                "post_attention_layernorm": get(b + "post_attention_layernorm.weight"),
                "q_proj": get(b + "self_attn.q_proj.weight"),
                "k_proj": get(b + "self_attn.k_proj.weight"),
                "v_proj": get(b + "self_attn.v_proj.weight"),
                "o_proj": get(b + "self_attn.o_proj.weight"),
                "gate_proj": get(b + "mlp.gate_proj.weight"),
                "up_proj": get(b + "mlp.up_proj.weight"),
                "down_proj": get(b + "mlp.down_proj.weight"),
            }
        )

    to_jnp = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=dtype), t
    )
    return {
        "vision": to_jnp(vparams),
        "projector": to_jnp(proj),
        "llama": to_jnp(lparams),
    }


def _strip_prefix(key: str) -> str:
    """Normalize both HF layouts to the classic one:
    - new:  model.language_model.X  -> language_model.model.X
            model.vision_tower.X    -> vision_tower.X
            model.multi_modal_projector.X -> multi_modal_projector.X
    - old:  already classic.
    """
    if key.startswith("model.language_model."):
        return "language_model.model." + key[len("model.language_model."):]
    if key.startswith("model.vision_tower."):
        return key[len("model."):]
    if key.startswith("model.multi_modal_projector."):
        return key[len("model."):]
    return key
