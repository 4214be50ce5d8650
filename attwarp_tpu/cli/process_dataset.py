"""Dataset processing driver (sequential + batched).

Parity with ``main.py:203-580`` and ``main_batched.py:123-314``: walks
TextVQA, extracts per-sample 24×24 attention, writes the full artifact set —

    original_images/{sid}_original.png
    masked_images/{sid}_masked.png               (JET overlay)
    raw_attention_maps/{sid}_raw_attn.npy        ((1,1,24,24) float)
    attention_maps_images/{sid}_attn_map_img.png (raw map as image)
    attention_maps/{sid}_mota_mask_vis.png       (grayscale MOTA mask)
    attention_maps/{sid}_mota_mask.npy
    warped_images/{sid}_identity.png             (500×500 identity warp)
    metadata/{sid}_metadata.json                 (saved_paths contract)

— with resumable progress (JSON manifest, SIGINT/atexit flush) and the
batched path's failure ladder: batch extraction error -> per-sample retry ->
uniform attention map as last resort (main_batched.py:214-233).

On TPU the warp + mask pipeline is batched and jitted; extraction batches
through the MLLM backend (``--backend mini`` is the test backend; a real
LLaVA backend plugs in via the same interface).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from attwarp_tpu.data.progress import ProgressManifest
from attwarp_tpu.data.textvqa import TextVQADataset
from attwarp_tpu.eval.harness import ANSWER_SUFFIX  # noqa: F401 (re-export convenience)
from attwarp_tpu.warp.blend import blend_mask
from attwarp_tpu.warp.io import save_warped_image

DEFAULT_WIDTH = 500
DEFAULT_HEIGHT = 500

ARTIFACT_DIRS = (
    "attention_maps",
    "warped_images",
    "visualizations",
    "original_images",
    "metadata",
    "masked_images",
    "attention_maps_images",
    "raw_attention_maps",
    "checkpoints",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("attwarp process-dataset")
    p.add_argument("--textvqa-json", default=None,
                   help="TextVQA_0.5.1-style json (with --image-dir)")
    p.add_argument("--jsonl", default=None,
                   help="generic JSONL: one {image_path, question, ...} per "
                        "line (GQA/DocVQA-style inputs)")
    p.add_argument("--image-dir", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--batch-size", type=int, default=32,
                   help="1 = sequential driver semantics; >1 = batched")
    p.add_argument(
        "--layer-index", type=str, default="20",
        help="decoder layer for attention extraction; a comma list "
             "('4,8,20') extracts every listed layer in ONE pass and writes "
             "per-layer raw maps (the *_multilayer training-data shape); "
             "the FIRST layer drives the mask/warp artifacts",
    )
    p.add_argument("--max-new-tokens", type=int, default=20)
    p.add_argument("--enhance-coe", type=float, default=10.0)
    p.add_argument("--kernel-size", type=int, default=3)
    p.add_argument("--width", type=int, default=DEFAULT_WIDTH)
    p.add_argument("--height", type=int, default=DEFAULT_HEIGHT)
    p.add_argument("--limit", type=int, default=None, help="Process at most N samples")
    p.add_argument(
        "--backend", default="mini",
        help="MLLM backend: 'mini' (self-contained test backend), "
             "'llava:<hf-id-or-path>', 'llava-ckpt:<orbax-dir>', "
             "'qwen2vl:<hf-id-or-path>', or 'qwen2vl-ckpt:<orbax-dir>'; "
             "append '+int8' to quantize the decoder for serving (w8a8), "
             "'+kv8' for an int8 KV cache (2x decode batch capacity), "
             "'+lm8' for an int8 LM head (quarters the logits-matmul HBM "
             "stream; logit precision moves), and/or '+flash' for the "
             "Pallas flash-attention prefill (TPU)",
    )
    return p


def parse_layer_spec(spec) -> "int | tuple":
    """'20' -> 20; '4,8,20' -> (4, 8, 20); ints and tuples pass through."""
    if isinstance(spec, (int, tuple)):
        return spec
    layers = tuple(int(x) for x in str(spec).split(",") if x.strip())
    if not layers:
        raise ValueError(f"empty --layer-index spec {spec!r}")
    return layers[0] if len(layers) == 1 else layers


def make_backend(name: str, layer_index):
    layer_index = parse_layer_spec(layer_index)
    # "+int8"/"+kv8"/"+flash" suffixes on any real backend, composable in any
    # order (llava-ckpt:/path+int8+kv8+flash): int8 quantizes the decoder
    # weights for serving (w8a8); kv8 stores the KV cache int8 (2x decode
    # batch capacity); flash routes the prefill through the Pallas
    # flash-attention kernel (TPU; extraction prefill is SURVEY §3.1 HOT LOOP 1)
    base, sep, suffix = name.rpartition("+")
    if sep and suffix in ("int8", "kv8", "flash", "lm8"):
        be = make_backend(base, layer_index)
        if suffix == "int8":
            if not hasattr(be, "quantize_int8"):
                raise ValueError(f"backend {base!r} has no int8 serving path")
            return be.quantize_int8()
        if suffix == "lm8":
            # int8 LM head: quarters the biggest non-decoder per-step HBM
            # stream (Qwen2-VL's 152k-vocab head). Logit precision moves —
            # opt-in, see numerics/quant.py::lm_logits.
            if not hasattr(be, "quantize_lm_head"):
                raise ValueError(f"backend {base!r} has no int8 LM-head path")
            return be.quantize_lm_head()
        if suffix == "kv8":
            if not hasattr(be, "kv_quant"):
                raise ValueError(f"backend {base!r} has no int8 KV-cache path")
            be.kv_quant = True
            return be
        if not hasattr(be, "use_flash"):
            raise ValueError(
                f"backend {base!r} has no flash-attention prefill path"
            )
        be.use_flash = True
        return be
    if name == "reader":
        # resolution-limited reader proxy (testing/reader.py): used with the
        # synthetic code-tag dataset to measure the warped-vs-original
        # accuracy gain end-to-end without real MLLM weights
        from attwarp_tpu.testing.reader import ReaderBackend

        return ReaderBackend()
    if name == "mini":
        from attwarp_tpu.extract.extraction import MiniLLaVABackend
        from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

        if not isinstance(layer_index, int):
            raise ValueError(
                "the mini backend extracts one layer; use a LLaVA/Qwen2-VL "
                "backend for multi-layer --layer-index"
            )
        # layer_index maps onto the mini model's extract layer (clamped)
        cfg = MiniLLaVAConfig()
        cfg = MiniLLaVAConfig(extract_layer=min(layer_index, cfg.n_layers - 1))
        return MiniLLaVABackend(cfg)
    if ":" in name:
        family, _, path = name.partition(":")
        if family == "llava":
            from attwarp_tpu.extract.llava_backend import LlavaBackend

            return LlavaBackend.from_hf(path, extract_layer=layer_index)
        if family == "llava-ckpt":
            from attwarp_tpu.extract.llava_backend import LlavaBackend

            return LlavaBackend.load(path, extract_layer=layer_index)
        if family == "qwen2vl":
            from attwarp_tpu.extract.qwen2vl_backend import Qwen2VLBackend

            return Qwen2VLBackend.from_hf(path, extract_layer=layer_index)
        if family == "qwen2vl-ckpt":
            from attwarp_tpu.extract.qwen2vl_backend import Qwen2VLBackend

            return Qwen2VLBackend.load(path, extract_layer=layer_index)
    raise ValueError(f"unknown backend {name}")


def _sample_major(maps: np.ndarray) -> np.ndarray:
    """Normalize extract output to sample-major: (B, h, w) stays; multi-layer
    (L, B, h, w) -> (B, L, h, w) so ``maps[k]`` is always one sample."""
    maps = np.asarray(maps)
    return maps.transpose(1, 0, 2, 3) if maps.ndim == 4 else maps


def _extract_with_fallback(backend, images: np.ndarray, questions: List[str],
                           max_new_tokens: int):
    """Batch extract; on failure retry per-sample; uniform map last resort.
    Returns sample-major maps: (B, h, w) or (B, L, h, w) for multi-layer."""
    try:
        maps, texts = backend.extract(images, questions,
                                      max_new_tokens=max_new_tokens)
        return _sample_major(maps), texts
    except Exception as e:
        print(f"Batch extraction failed ({e}); retrying per-sample.")
    maps, texts = [], []
    n_side = getattr(backend, "num_patches_side", int(np.sqrt(576)))
    layers = getattr(backend, "extract_layer", None)
    if layers is not None and not isinstance(layers, int):
        uniform = np.full((len(layers), n_side, n_side),
                          1.0 / n_side**2, np.float32)
    else:
        uniform = np.full((n_side, n_side), 1.0 / n_side**2, np.float32)
    for i in range(images.shape[0]):
        try:
            m, t = backend.extract(images[i : i + 1], [questions[i]],
                                   max_new_tokens=max_new_tokens)
            maps.append(_sample_major(m)[0])
            texts.append(t[0])
        except Exception as e2:
            print(f"Per-sample extraction failed ({e2}); uniform map fallback.")
            maps.append(uniform)
            texts.append("")
    return np.stack(maps), texts


class JsonlDataset:
    """Generic driver input: JSONL of {image_path, question, answers?, ...}.
    Covers GQA/DocVQA-style processing (the reference ran the same driver
    over multiple datasets; only TextVQA's loader is in the snapshot)."""

    def __init__(self, jsonl_path: str):
        self.samples = []
        with open(jsonl_path, "r") as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        self.samples.append(json.loads(line))
                    except json.JSONDecodeError:
                        continue

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> dict:
        sample = dict(self.samples[idx])
        path = sample.get("image_path")
        img = None
        if path and os.path.exists(path):
            try:
                with Image.open(path) as im:
                    img = np.asarray(im.convert("RGB"))
            except Exception:
                img = None
        sample["loaded_image"] = img
        sample.setdefault("image_id", os.path.splitext(os.path.basename(path or f"s{idx}"))[0])
        return sample


def process_dataset(
    textvqa_json: Optional[str],
    image_dir: Optional[str],
    output_dir: str,
    backend,
    jsonl: Optional[str] = None,
    batch_size: int = 32,
    max_new_tokens: int = 20,
    enhance_coe: float = 10.0,
    kernel_size: int = 3,
    width: int = DEFAULT_WIDTH,
    height: int = DEFAULT_HEIGHT,
    limit: Optional[int] = None,
) -> dict:
    dirs = {}
    for d in ARTIFACT_DIRS:
        dirs[d] = os.path.join(output_dir, d)
        os.makedirs(dirs[d], exist_ok=True)

    if jsonl:
        dataset = JsonlDataset(jsonl)
    elif textvqa_json:
        dataset = TextVQADataset(textvqa_json, image_dir)
    else:
        raise ValueError("need --textvqa-json or --jsonl")
    # Candidate selection reads only metadata (no image decode): images are
    # loaded lazily per chunk, so a full-dataset run holds one chunk of
    # decoded images in RAM instead of all of them. Progress is keyed by the
    # STABLE dataset index, so resume stays correct even if the set of
    # loadable images changes between runs.
    candidates = []
    for idx in range(len(dataset)):
        if dataset.samples[idx].get("question"):
            candidates.append(idx)
        if limit and len(candidates) >= limit:
            break
    if not candidates:
        print("No valid samples.")
        return {"processed": 0, "failed": 0}

    progress = ProgressManifest(
        os.path.join(dirs["checkpoints"], "processing_progress.json")
    )
    progress.install_handlers()
    remaining = [
        i for i in candidates if i not in progress.processed_internal_indices
    ]
    print(f"Processing {len(remaining)} of {len(candidates)} samples.")

    from attwarp_tpu.extract.extraction import _resize_for_backend

    # Pipeline: the device extracts batch N+1 while the host writes batch
    # N's artifacts on a writer thread (SURVEY §7 step 6: warp/IO overlapped
    # with MLLM inference).
    import queue as _queue
    import threading as _threading

    work_q: "_queue.Queue" = _queue.Queue(maxsize=2)
    _sentinel = object()

    def _writer():
        while True:
            item = work_q.get()
            if item is _sentinel:
                return
            items, maps = item
            try:
                _write_chunk(items, maps)
            except Exception as e:
                # the writer must never die: a dead consumer would deadlock
                # the bounded queue and hang the driver forever
                print(f"Writer error for chunk starting at {items[0][0]}: {e}")
                for i, _img, _q, _meta in items:
                    try:
                        progress.mark(i, failed=True)
                    except Exception:
                        pass

    def _write_chunk(items, maps):
        for k, (i, image, question, meta) in enumerate(items):
            image_id = meta.get("image_id", f"sample{i}")
            sid = f"{image_id}_{meta['original_index']}"
            att = np.asarray(maps[k], np.float32)
            layer_maps = None
            if att.ndim == 3:  # multi-layer (L, h, w): FIRST layer is primary
                layer_ids = tuple(getattr(backend, "extract_layer", range(len(att))))
                layer_maps = dict(zip(layer_ids, att))
                att = att[0]
            failed = False
            saved = {
                "original_image": None,
                "masked_image": None,
                "attention_map_image_from_api": None,
                "raw_attention_map_npy": None,
                "mota_mask_visualization": None,
                "mota_mask_npy": None,
                "warped_image_identity": None,
            }
            try:
                orig_path = os.path.join(dirs["original_images"], f"{sid}_original.png")
                Image.fromarray(np.asarray(image, np.uint8)).save(orig_path)
                saved["original_image"] = orig_path

                raw_path = os.path.join(dirs["raw_attention_maps"], f"{sid}_raw_attn.npy")
                np.save(raw_path, att[None, None])  # (1,1,24,24)
                saved["raw_attention_map_npy"] = raw_path

                if layer_maps is not None:  # one file per extracted layer
                    saved["raw_attention_maps_per_layer"] = {}
                    for lid, lmap in layer_maps.items():
                        lp = os.path.join(
                            dirs["raw_attention_maps"],
                            f"{sid}_raw_attn_layer{lid}.npy",
                        )
                        np.save(lp, lmap[None, None])
                        saved["raw_attention_maps_per_layer"][str(lid)] = lp

                attn_img_path = os.path.join(
                    dirs["attention_maps_images"], f"{sid}_attn_map_img.png"
                )
                a = att - att.min()
                a = a / max(a.max(), 1e-12)
                Image.fromarray((a * 255).astype(np.uint8), mode="L").save(attn_img_path)
                saved["attention_map_image_from_api"] = attn_img_path

                overlay, mota = blend_mask(
                    np.asarray(image, np.uint8), jnp.asarray(att),
                    enhance_coe, kernel_size,
                )
                masked_path = os.path.join(dirs["masked_images"], f"{sid}_masked.png")
                Image.fromarray(overlay).save(masked_path)
                saved["masked_image"] = masked_path

                mota_vis = os.path.join(dirs["attention_maps"], f"{sid}_mota_mask_vis.png")
                Image.fromarray(mota, mode="L").save(mota_vis)
                saved["mota_mask_visualization"] = mota_vis
                mota_npy = os.path.join(dirs["attention_maps"], f"{sid}_mota_mask.npy")
                np.save(mota_npy, mota)
                saved["mota_mask_npy"] = mota_npy

                warped_path = os.path.join(dirs["warped_images"], f"{sid}_identity.png")
                ok = save_warped_image(
                    image_path=np.asarray(image, np.uint8),
                    att_map=mota,
                    original_image_save_path=None,
                    masked_overlay_save_path=None,
                    output_path=warped_path,
                    width=width,
                    height=height,
                    transform="identity",
                )
                if ok:
                    saved["warped_image_identity"] = warped_path
            except Exception as e:
                print(f"Error processing {sid}: {e}")
                failed = True
            finally:
                meta_out = dict(meta)
                meta_out["sample_id"] = sid
                meta_out["api_model_name"] = getattr(backend, "name", "mini-llava")
                if layer_maps is not None:
                    meta_out["extract_layers"] = [int(l) for l in layer_maps]
                meta_out["saved_paths"] = saved
                meta_path = os.path.join(dirs["metadata"], f"{sid}_metadata.json")
                try:
                    with open(meta_path, "w", encoding="utf-8") as f:
                        json.dump(meta_out, f, indent=2, ensure_ascii=False, default=str)
                except Exception as e:
                    print(f"Critical: metadata save failed for {sid}: {e}")
                    failed = True
                progress.mark(i, failed=failed)

    writer = _threading.Thread(target=_writer, daemon=True)
    writer.start()
    try:
        for start in range(0, len(remaining), max(batch_size, 1)):
            chunk = remaining[start : start + max(batch_size, 1)]
            items = []
            for i in chunk:
                entry = dataset[i]  # lazy image decode, one chunk at a time
                if entry.get("loaded_image") is None:
                    progress.mark(i, failed=True)
                    continue
                meta = {k: v for k, v in entry.items() if k != "loaded_image"}
                meta["original_index"] = i
                items.append((i, entry["loaded_image"], entry["question"], meta))
            if not items:
                continue
            if getattr(backend, "supports_device_pixels", False):
                # one upload + one fused resize dispatch per shape group —
                # per-image host resizes cost seconds per batch through a
                # remote-device link (see attwarp_tpu/pipeline.py)
                from attwarp_tpu.extract.extraction import resize_images_batch

                batch = resize_images_batch(
                    [im for _, im, _, _ in items], backend.image_size
                )
            else:
                batch = np.stack(
                    [_resize_for_backend(im, backend.image_size)
                     for _, im, _, _ in items]
                )
            qs = [q for _, _, q, _ in items]
            maps, _texts = _extract_with_fallback(backend, batch, qs, max_new_tokens)
            work_q.put((items, np.asarray(maps)))
    finally:
        work_q.put(_sentinel)
        writer.join()

    print(
        f"Done. processed={progress.processed_count} failed={progress.failed_count}"
    )
    return {"processed": progress.processed_count, "failed": progress.failed_count}


def main(argv=None) -> int:
    from attwarp_tpu.cli import pin_platform

    pin_platform()
    args = build_parser().parse_args(argv)
    from attwarp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    backend = make_backend(args.backend, args.layer_index)
    stats = process_dataset(
        args.textvqa_json,
        args.image_dir,
        args.output_dir,
        backend,
        jsonl=args.jsonl,
        batch_size=args.batch_size,
        max_new_tokens=args.max_new_tokens,
        enhance_coe=args.enhance_coe,
        kernel_size=args.kernel_size,
        width=args.width,
        height=args.height,
        limit=args.limit,
    )
    return 0 if stats["failed"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
