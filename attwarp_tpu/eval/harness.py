"""TextVQA accuracy harness over processed-dataset metadata.

Parity with ``evaluate_accuracy.py:275-473``: consumes the drivers'
``saved_paths`` metadata contract (``warped_image_identity``), runs the MLLM
on each warped image with the reference's prompt suffix, scores with the
binary VQA accuracy at threshold=1, and writes the same artifact set —
per-sample detailed txt log, moving-average CSV every 10 samples, interim
JSON every 100, final JSON + summary txt.

Inference goes through a duck-typed backend exposing
``answer(image_rgb: np.ndarray, question: str, max_new_tokens: int) -> str``
(the TPU JAX MLLM; the mini test backend in attwarp_tpu.extract works too).
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from attwarp_tpu.eval.vqa_text import calculate_vqa_accuracy

ANSWER_SUFFIX = "Answer in a single word or key phrase."


class ExtractionAnswerBackend:
    """Adapts an attention-extraction backend (``extract(images, questions)``)
    to the harness's ``answer`` interface.

    Backends exposing ``answer_batch`` (the real LLaVA/Qwen2-VL backends) get
    the answer-only fast path: a generate with ``extract_layer=None`` that
    never materializes attention probabilities nor scans an accumulator —
    eval answering is a plain decode, not a full extraction."""

    def __init__(self, backend, max_new_tokens: int = 64):
        self.backend = backend
        self.max_new_tokens = max_new_tokens

    def answer(self, image_rgb: np.ndarray, question: str, max_new_tokens: Optional[int] = None) -> str:
        from attwarp_tpu.extract.extraction import _resize_for_backend

        img = _resize_for_backend(image_rgb, self.backend.image_size)
        mnt = max_new_tokens or self.max_new_tokens
        q = question + ANSWER_SUFFIX
        if hasattr(self.backend, "answer_batch"):
            return self.backend.answer_batch(img[None], [q], max_new_tokens=mnt)[0]
        _maps, texts = self.backend.extract(img[None], [q], max_new_tokens=mnt)
        return texts[0]

    def answer_many(self, images, questions, max_new_tokens: Optional[int] = None) -> List[str]:
        """Batched answering when the inner backend supports it — the
        harness buffers samples and answers a chunk in ONE prefill+decode
        instead of a call per sample."""
        from attwarp_tpu.extract.extraction import _resize_for_backend

        if not hasattr(self.backend, "answer_batch"):
            return [self.answer(im, q, max_new_tokens)
                    for im, q in zip(images, questions)]
        mnt = max_new_tokens or self.max_new_tokens
        imgs = np.stack([
            _resize_for_backend(im, self.backend.image_size) for im in images
        ])
        qs = [q + ANSWER_SUFFIX for q in questions]
        return self.backend.answer_batch(imgs, qs, max_new_tokens=mnt)


class EngineAnswerBackend:
    """Answer through the continuous-batching ServeEngine: every buffered
    sample becomes a request, the slot pool decodes them concurrently —
    the eval harness's high-throughput path (the reference harness answers
    strictly one sample at a time, evaluate_accuracy.py:329-349)."""

    def __init__(self, backend, slots: int = 8, max_seq: Optional[int] = None,
                 max_new_tokens: int = 64, steps_per_tick: int = 8):
        self.backend = backend
        self.max_new_tokens = max_new_tokens
        self.slots = slots
        self.steps_per_tick = steps_per_tick
        # The engine is built LAZILY, on the first chunk: at 7B every extra
        # max_seq token costs ~1 MiB of dense KV cache PER SLOT (16 slots ×
        # 64 tokens ≈ 1 GiB), and the old generous static cap (image tokens
        # + 192 text + answer + 64 slack = 904 at LLaVA geometry) pushed the
        # 16-slot dense cache past HBM beside the int8 weights. Sizing from
        # the actual tokenized prompts of the first chunk gives the measured
        # -fitting 640-bucket profile; rarer longer prompts route through
        # the plain batched decode (the _fits overflow path below).
        self._max_seq_cfg = max_seq
        self.engine = None
        self._engine_dead = False

    def _fit_slots(self, max_seq: int, kv_quant: bool) -> int:
        """HBM-aware slot cap. The runbook's first 7B dry-run OOM'd here:
        32 requested slots at image-prompt max_seq (~768) cost ~6.7 GiB of
        int8 KV cache beside ~8 GiB of int8-weights+embeds — past a v5e's
        16 GiB once prefill workspace lands. Size the cache to the budget
        that is actually left instead of trusting the caller's slot count:
        budget = device HBM (memory_stats when the backend reports it,
        16 GiB v5e default) - weights - prefill/compile workspace."""
        t = self.backend.model.cfg.text
        if kv_quant:
            # ServeEngine rounds the slot cache up to a 64-multiple for the
            # flash-decoding kernel's seq-tile gate — size what it builds
            max_seq = -(-max_seq // 64) * 64
        per_tok = 2 * t.num_hidden_layers * t.kv_heads * t.head_dim
        per_slot = per_tok * max_seq * ((1 + 4 / t.head_dim) if kv_quant else 2)
        weights = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(self.backend.model.params))
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm = stats.get("bytes_limit", 0)
        except Exception:
            hbm = 0
        if not hbm or jax.default_backend() == "cpu":
            # CPU mesh (tests) has no real limit; TPU default: v5e 16 GiB
            # (the axon relay's memory_stats() returns {} — measured)
            hbm = (1 << 62) if jax.default_backend() == "cpu" else 16 * 2**30
        # the batched admission's returned KV block sits beside the slot
        # cache at its peak — that transient plus compile workspace is what
        # tipped the first dry-run over at 32 slots × 188 MiB beside
        # 7.9 GiB of weights. The startup admission ramp (engine
        # admit_batch_cold, default min(slots, 8)) makes the cold wave's
        # block up to 8 requests wide, so size for that.
        # NOTE: ServeEngine._fit_cold_cap models the same transient with a
        # fuller per-row formula (block + prefill activations) to clamp
        # the cold cap at runtime; the two are deliberately NOT unified —
        # this slot-sizing term is calibrated by the GREEN 7B runbook run
        # (tools/runbook_dryrun.log) and the engine's by four measured
        # admit-N feasibility points, and the engine's clamp is the
        # runtime guarantor either way (an 8-wide reservation here is
        # conservative, never unsafe).
        admit_block = min(8, self.slots) * max_seq * per_tok * (
            1 if kv_quant else 2)
        # 3 GiB reserve: the second runbook dry-run still OOM'd with a
        # 1.5 GiB reserve at 30 slots (the admission prefill's executable +
        # activations + relay-side allocator slack are not visible from
        # here) — measured, not theoretical
        budget = int(hbm * 0.90) - weights - admit_block - 3 * 2**30
        fit = max(1, int(budget // per_slot))
        if fit < self.slots:
            print(f"EngineAnswerBackend: reducing slots {self.slots} -> "
                  f"{fit} (per-slot cache {per_slot / 2**20:.0f} MiB at "
                  f"max_seq={max_seq}, weights {weights / 2**30:.1f} GiB, "
                  f"HBM {hbm / 2**30:.0f} GiB)")
        return min(self.slots, fit)

    def _ensure_engine(self, prompt_lens: List[int], mnt: int) -> None:
        if self.engine is not None or self._engine_dead or not prompt_lens:
            return
        from attwarp_tpu.serving import ServeEngine

        backend = self.backend
        if self._max_seq_cfg is not None:
            max_seq = self._max_seq_cfg
        else:
            bucket = 64
            max_bucketed = max(-(-L // bucket) * bucket for L in prompt_lens)
            # generous upper cap: the old static formula
            n_img = int(backend.num_patches_side) ** 2
            cap = (-(-(n_img + 192) // 64) * 64
                   + self.max_new_tokens + self.steps_per_tick + 64)
            max_seq = min(max_bucketed + mnt + self.steps_per_tick, cap)
        kv_quant = bool(getattr(backend, "kv_quant", False))
        self.engine = ServeEngine(
            backend.model, slots=self._fit_slots(max_seq, kv_quant),
            max_seq=max_seq, kv_quant=kv_quant,
            steps_per_tick=self.steps_per_tick,
            use_flash=bool(getattr(backend, "use_flash", False)),
        )

    def _retire_engine(self, dead: bool = True) -> None:
        """Failure recovery: drop the engine AND its KV cache (at 7B the
        dense 16-slot cache is ~6 GiB of HBM — keeping it alive is what
        made every post-failure fallback OOM too). jax.clear_caches()
        drops the engine's compiled executables as well — a big jitted
        program pins device workspace, and the runbook's first dry-run
        showed the fallbacks STILL OOMing after the cache arrays were
        freed. MUST be called OUTSIDE any ``except`` block holding the
        engine failure: the live exception's traceback references
        ``engine.run``'s frames, which pin the engine (and its cache)
        through any gc.collect() made before the block exits — the second
        dry-run's post-retirement OOM cascade. ``dead=False`` keeps the
        engine path eligible for a rebuild (at a reduced slot count)."""
        import gc

        self._engine_dead = dead
        self.engine = None
        gc.collect()
        try:
            jax.clear_caches()
        except Exception:
            pass
        try:
            # one tiny round-trip so the relay processes the queued buffer
            # deletes before the fallback path allocates
            jax.device_get(jnp.zeros((), jnp.float32) + 0)
        except Exception:
            pass

    def _decode(self, toks) -> str:
        if toks and toks[-1] == self.backend.model.cfg.eos_token_id:
            toks = toks[:-1]
        return self.backend.tokenizer.decode(
            toks, skip_special_tokens=True
        ).strip()

    def answer(self, image_rgb, question, max_new_tokens=None) -> str:
        return self.answer_many([image_rgb], [question], max_new_tokens)[0]

    def _fits(self, ids, mnt: int) -> bool:
        eng = self.engine
        bucketed = -(-len(ids) // eng.bucket) * eng.bucket
        return bucketed + mnt + eng.steps_per_tick <= eng.max_seq

    def answer_many(self, images, questions, max_new_tokens=None) -> List[str]:
        from attwarp_tpu.extract.extraction import _resize_for_backend

        mnt = max_new_tokens or self.max_new_tokens
        ids_all = [
            np.asarray(self.backend.build_ids(q + ANSWER_SUFFIX), np.int64)
            for q in questions
        ]
        self._ensure_engine([len(x) for x in ids_all], mnt)
        # a prompt longer than the engine's max_seq (an unusually long
        # question) must not fail the chunk — nor silently drop the sample
        # from the eval denominator: route the oversized ones through the
        # backend's plain batched decode, which buckets by actual length
        answers: List[Optional[str]] = [None] * len(images)
        rids, engine_idx, overflow_idx = [], [], []
        if self.engine is None:       # engine retired (or nothing to size)
            overflow_idx = list(range(len(images)))
        else:
            # up to two engine attempts per chunk: a failed engine (HBM
            # exhaustion at an unlucky slot count) retires — freeing its
            # multi-GiB KV cache, which would otherwise OOM every
            # subsequent fallback too — and is rebuilt ONCE at half the
            # slots before the chunk (and all future ones) falls back to
            # the plain batched decode. The retire/rebuild happens OUTSIDE
            # the except block: the live traceback pins engine.run's
            # frames, so gc inside the block cannot free the cache.
            for attempt in range(2):
                failed = None
                try:
                    rids, engine_idx, overflow_idx = [], [], []
                    for i, (im, ids) in enumerate(zip(images, ids_all)):
                        if not self._fits(ids, mnt):
                            overflow_idx.append(i)
                            continue
                        px = self.backend._preprocess(
                            _resize_for_backend(im, self.backend.image_size)
                        )
                        rids.append(
                            self.engine.submit(ids, px, max_new_tokens=mnt))
                        engine_idx.append(i)
                    results = self.engine.run()
                    break
                except Exception as e:
                    failed = str(e)   # string only: keeping the exception
                    #                   object keeps its traceback's frames
                half = max(1, self.engine.slots // 2)
                rids, engine_idx = [], []
                results = {}
                if attempt == 0 and half >= 4:
                    print(f"ServeEngine failed ({failed}); rebuilding at "
                          f"{half} slots (was {self.engine.slots}).")
                    self._retire_engine(dead=False)
                    self.slots = half
                    self._ensure_engine([len(x) for x in ids_all], mnt)
                    if self.engine is not None:
                        continue
                    overflow_idx = list(range(len(images)))
                    break
                print(f"ServeEngine failed ({failed}); retiring the engine "
                      "and answering via the batched decode path.")
                self._retire_engine()
                overflow_idx = list(range(len(images)))
                break
        for i, r in zip(engine_idx, rids):
            answers[i] = self._decode(results[r])
        if overflow_idx:
            imgs = np.stack([
                _resize_for_backend(images[i], self.backend.image_size)
                for i in overflow_idx
            ])
            outs = self.backend.answer_batch(
                imgs, [questions[i] + ANSWER_SUFFIX for i in overflow_idx],
                max_new_tokens=mnt,
            )
            for i, o in zip(overflow_idx, outs):
                answers[i] = o
        return answers


def evaluate_textvqa_accuracy(
    metadata_dir: str,
    output_dir: str,
    backend,
    model_name: str = "attwarp-tpu-mllm",
    max_new_tokens: int = 64,
    limit: Optional[int] = None,
    score_original: bool = False,
    batch_size: int = 1,
) -> Dict:
    """``batch_size > 1`` buffers samples and answers each chunk through
    ``backend.answer_many`` (one batched prefill+decode — or the serving
    engine via ``EngineAnswerBackend``) instead of a call per sample; scores
    and artifacts are identical, produced in the same order."""
    os.makedirs(output_dir, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    moving_avg_log = os.path.join(output_dir, f"textvqa_moving_accuracy_{ts}.csv")
    detailed_log = os.path.join(output_dir, f"textvqa_detailed_log_{ts}.txt")

    with open(detailed_log, "w", encoding="utf-8") as f:
        f.write("TEXTVQA FULL EVALUATION - DETAILED LOG\n")
        f.write(f"Model: {model_name}\n")
        f.write(f"Timestamp: {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        f.write(
            "Evaluation Metric: Standard VQA accuracy with text preprocessing "
            "(min(0.3*n, 1), n=matching answers)\n"
        )
        f.write("=" * 80 + "\n\n")

    files = sorted(glob.glob(os.path.join(metadata_dir, "*.json")))
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"No metadata JSON files found in {metadata_dir}")

    overall = {
        "warped": {"correct": 0, "total": 0},
        "original": {"correct": 0, "total": 0},
    }
    detailed: List[Dict] = []
    counter = 0

    batch_n = batch_size if (batch_size > 1 and hasattr(backend, "answer_many")) else 1
    pending: List[Dict] = []

    def _score_one(p, raw, oraw):
        nonlocal counter
        if raw is None:
            return
        sample_id, question, gts = p["sample_id"], p["question"], p["gts"]
        correct = calculate_vqa_accuracy(raw.strip(), gts, threshold=1)
        record = {
            "sample_id": sample_id,
            "question": question,
            "ground_truth_answers": gts,
            "warped_answer": raw,
            "warped_correct": bool(correct),
        }
        # the paper's claim is the warped-vs-original DELTA: optionally
        # score the unwarped image too (the reference harness only
        # scored warped; the original baseline ran as a separate job)
        if oraw is not None:
            ocorrect = calculate_vqa_accuracy(oraw.strip(), gts, threshold=1)
            overall["original"]["total"] += 1
            overall["original"]["correct"] += int(ocorrect)
            record["original_answer"] = oraw
            record["original_correct"] = bool(ocorrect)

        overall["warped"]["total"] += 1
        overall["warped"]["correct"] += int(correct)
        counter += 1
        detailed.append(record)

        tot = overall["warped"]["total"]
        cor = overall["warped"]["correct"]
        with open(detailed_log, "a", encoding="utf-8") as f:
            f.write("\n" + "=" * 80 + "\n")
            f.write(f"SAMPLE: {sample_id} - {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
            f.write("-" * 80 + "\n")
            f.write(f"QUESTION: {question}\n\n")
            f.write(f"GROUND TRUTH ANSWERS: {gts}\n\n")
            f.write(f"WARPED IMAGE ANSWER:   {raw} (Correct: {correct})\n\n")
            f.write("CURRENT OVERALL STATS:\n")
            f.write(f"  Warped accuracy:   {cor / max(1, tot):.4f} ({cor}/{tot})\n")

        if counter % 10 == 0:
            exists = os.path.exists(moving_avg_log)
            with open(moving_avg_log, "a") as f:
                if not exists:
                    f.write("Timestamp,Iteration,Total_Samples,Warped_Accuracy\n")
                f.write(
                    f"{time.strftime('%Y-%m-%d %H:%M:%S')},{counter},{tot},"
                    f"{cor / max(1, tot):.4f}\n"
                )
        if counter % 100 == 0:
            interim = {
                "model": model_name,
                "overall_warped_accuracy": cor / max(1, tot),
                "total_samples_processed": tot,
                "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            }
            with open(
                os.path.join(output_dir, f"textvqa_interim_results_{ts}_{counter}.json"),
                "w",
            ) as f:
                json.dump(interim, f, indent=2)

    def _answer_all(images, questions):
        """Batched answering with a per-sample fallback: one bad sample (or
        an oversized prompt) must not discard the rest of the chunk — the
        pre-batching harness skipped exactly one sample per failure."""
        if batch_n > 1:
            try:
                return backend.answer_many(images, questions, max_new_tokens)
            except Exception as e:
                print(f"Batched answering failed ({e}); per-sample fallback.")
        out = []
        for im, q in zip(images, questions):
            try:
                out.append(backend.answer(im, q, max_new_tokens))
            except Exception as e:
                print(f"Error answering sample: {e}. Skipping.")
                out.append(None)
        return out

    def _flush():
        if not pending:
            return
        answers = _answer_all([p["img"] for p in pending],
                              [p["question"] for p in pending])
        oanswers = [None] * len(pending)
        if score_original:
            have = [i for i, p in enumerate(pending) if p["oimg"] is not None]
            if have:
                outs = _answer_all([pending[i]["oimg"] for i in have],
                                   [pending[i]["question"] for i in have])
                for i, o in zip(have, outs):
                    oanswers[i] = o
        for p, raw, oraw in zip(pending, answers, oanswers):
            try:
                _score_one(p, raw, oraw)
            except Exception as e:
                print(f"Error scoring {p['sample_id']}: {e}. Skipping.")
        pending.clear()

    for path in files:
        try:
            with open(path, "r", encoding="utf-8") as f:
                meta = json.load(f)
            sample_id = meta.get("sample_id")
            question = meta.get("question")
            gts = meta.get("answers")
            saved = meta.get("saved_paths", {})
            warped_path = saved.get("warped_image_identity")
            if not sample_id or not question or not isinstance(gts, list) or not gts:
                continue
            if not warped_path or not os.path.exists(warped_path):
                continue
            with Image.open(warped_path) as im:
                img = np.asarray(im.convert("RGB"))
            oimg = None
            if score_original:
                orig_path = saved.get("original_image")
                if orig_path and os.path.exists(orig_path):
                    with Image.open(orig_path) as im:
                        oimg = np.asarray(im.convert("RGB"))
            pending.append({
                "sample_id": sample_id,
                "question": question,
                "gts": [str(g).strip() for g in gts],
                "img": img,
                "oimg": oimg,
            })
            if len(pending) >= batch_n:
                _flush()
        except Exception as e:
            print(f"Error processing {path}: {e}. Skipping.")
            continue
    _flush()

    tot = overall["warped"]["total"]
    cor = overall["warped"]["correct"]
    acc = cor / tot if tot else 0.0
    final = {
        "model": model_name,
        "dataset": "TextVQA",
        "evaluation_metric": (
            "Standard VQA accuracy with text preprocessing "
            "(min(0.3*n, 1), n=matching answers)"
        ),
        "overall_warped_accuracy": acc,
        "total_samples_evaluated": tot,
        "detailed_results": detailed,
    }
    if score_original and overall["original"]["total"]:
        oacc = overall["original"]["correct"] / overall["original"]["total"]
        final["overall_original_accuracy"] = oacc
        final["accuracy_gain"] = acc - oacc
    with open(os.path.join(output_dir, f"textvqa_accuracy_{ts}.json"), "w", encoding="utf-8") as f:
        json.dump(final, f, indent=2, ensure_ascii=False)
    with open(os.path.join(output_dir, f"textvqa_accuracy_{ts}_summary.txt"), "w", encoding="utf-8") as f:
        f.write("TextVQA Accuracy Evaluation\n")
        f.write(f"Model: {model_name}\n")
        f.write(f"Total samples evaluated: {tot}\n")
        f.write(f"Evaluation Metric: {final['evaluation_metric']}\n\n")
        f.write(f"Overall accuracy on warped images: {acc:.4f} ({cor}/{tot})\n")
    return final
