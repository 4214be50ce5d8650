#!/usr/bin/env bash
# Real-weights TextVQA runbook: HF checkpoint -> ported orbax -> full
# attention-guided-warp pipeline -> VQA accuracy (warped vs original).
#
# Mirrors the reference flow end to end: extraction + warping as in
# main_batched.py:123-314, scoring as in evaluate_accuracy.py:275-473.
#
# Usage:
#   tools/run_textvqa_7b.sh /path/to/workdir \
#       [--hf llava-hf/llava-1.5-7b-hf] \
#       [--textvqa-json TextVQA_0.5.1_val.json --image-dir train_images] \
#       [--dry-run] [--limit N]
#
# --dry-run replaces the two network-dependent inputs (the HF weight
# download and the TextVQA download) with a random 7B-SHAPE checkpoint
# (tools/make_random_7b_ckpt.py) and the synthetic code-tag set
# (tools/make_codetag_dataset.py); every other command is byte-identical
# to the real run, so only the downloads themselves go untested here.
#
# Expected timings (one v5e chip through the axon relay; ARCHITECTURE.md):
#   port (step 1):      ~10-20 min  (7B f32 torch load + transpose + orbax)
#   extraction (step 3): ~10.5 samples/s at int8+kv8 batch 16, AFTER a
#                        one-time jit compile that can take 10-25 min for
#                        a 7B B=16 program — do not kill the quiet
#                        phase. The CLIs persist compiled executables
#                        (utils/compile_cache.py; $ATTWARP_COMPILE_CACHE_DIR
#                        overrides the ~/.cache/attwarp_tpu default), so
#                        re-runs and the evaluate step skip the long waits.
#   answering (step 4):  ~680 tok/s aggregate at 32 serving slots (int8
#                        weights + int8 KV cache read by the Pallas
#                        flash-decoding kernel, batched admission + flash
#                        prefill)
# TextVQA val (5000 samples) ≈ 9 min extraction + ~1.5 h scoring both
# warped and original images at 64 max-new-tokens.
set -euo pipefail

WORK="${1:?usage: run_textvqa_7b.sh WORKDIR [--hf ID] [--dry-run] ...}"
shift
HF_ID="llava-hf/llava-1.5-7b-hf"
TEXTVQA_JSON=""
IMAGE_DIR=""
DRY=0
LIMIT=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --hf) HF_ID="$2"; shift 2 ;;
    --textvqa-json) TEXTVQA_JSON="$2"; shift 2 ;;
    --image-dir) IMAGE_DIR="$2"; shift 2 ;;
    --dry-run) DRY=1; shift ;;
    --limit) LIMIT="$2"; shift 2 ;;
    *) echo "unknown flag $1" >&2; exit 2 ;;
  esac
done

cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"   # append, never overwrite
mkdir -p "$WORK"
CKPT="$WORK/llava-1.5-7b-jax"
PROC="$WORK/processed"
EVAL="$WORK/eval"
log() { echo "[run_textvqa_7b $(date +%H:%M:%S)] $*"; }

# ── 0. weights availability: the same invocation runs unmodified the day
#       a checkpoint lands — if no ported checkpoint exists and the HF hub
#       is unreachable (this build env has zero egress), fall back to the
#       dry-run inputs loudly instead of failing 20 minutes in. ──────────
if [[ "$DRY" == 0 && ! -f "$CKPT/config.json" ]]; then
  if ! python - "$HF_ID" <<'EOF'
import socket, sys, urllib.request
socket.setdefaulttimeout(8)
try:
    urllib.request.urlopen("https://huggingface.co/api/models/" + sys.argv[1])
except Exception:
    sys.exit(1)
EOF
  then
    log "NOTE: $HF_ID is unreachable and no ported checkpoint exists at"
    log "      $CKPT — falling back to --dry-run (random 7B-shape weights +"
    log "      synthetic code-tag set). Re-run with network (or a ported"
    log "      checkpoint in place) for the real-weights run."
    DRY=1
  fi
fi

# ── 1. checkpoint: HF port (real) or random 7B shape (dry run) ──────────
if [[ ! -f "$CKPT/config.json" ]]; then
  if [[ "$DRY" == 1 ]]; then
    log "DRY RUN: building random 7B-shape checkpoint (CPU) ..."
    JAX_PLATFORMS=cpu python tools/make_random_7b_ckpt.py --out "$CKPT"
  else
    log "porting $HF_ID -> $CKPT (bf16; needs torch+transformers once) ..."
    python tools/port_llava.py --hf-path "$HF_ID" --out "$CKPT" --bf16
  fi
else
  log "checkpoint $CKPT already present; skipping port"
fi

# ── 2. dataset: TextVQA val (real) or synthetic code-tag set (dry run) ──
if [[ "$DRY" == 1 && -z "$TEXTVQA_JSON" ]]; then
  if [[ ! -f "$WORK/data/codetag_val.json" ]]; then
    log "DRY RUN: generating synthetic code-tag TextVQA set ..."
    JAX_PLATFORMS=cpu python tools/make_codetag_dataset.py "$WORK/data" \
        --n "${LIMIT:-16}"
  fi
  TEXTVQA_JSON="$WORK/data/codetag_val.json"
  IMAGE_DIR="$WORK/data/images"
fi
[[ -n "$TEXTVQA_JSON" && -n "$IMAGE_DIR" ]] || {
  echo "need --textvqa-json + --image-dir (download TextVQA_0.5.1_val.json" \
       "and the OpenImages train_images split)" >&2; exit 2; }

# ── 3. first pass: extraction -> MOTA mask -> warp (9-dir artifacts) ────
log "processing dataset (extraction + warp; int8 weights + int8 KV cache) ..."
python -m attwarp_tpu.cli.process_dataset \
    --textvqa-json "$TEXTVQA_JSON" --image-dir "$IMAGE_DIR" \
    --output-dir "$PROC" \
    --backend "llava-ckpt:$CKPT+int8+kv8" \
    --batch-size 16 --layer-index 20 \
    ${LIMIT:+--limit "$LIMIT"}

# ── 4. second pass: answer on warped AND original, report the gain ──────
# int8 KV cache: the Pallas flash-decoding kernel made +kv8 the fastest
# config at width (ARCHITECTURE.md decode table — 1355 tok/s at B=32;
# extraction headline 10.53 samples/s at int8+kv8 B=16), and the halved
# cache HBM is what lets 32 slots fit beside the int8 weights.
log "evaluating (32-slot serving engine; scores warped vs original) ..."
python -m attwarp_tpu.cli.evaluate \
    --metadata-dir "$PROC/metadata" --output-dir "$EVAL" \
    --model "llava-ckpt:$CKPT+int8+kv8+flash" \
    --serve-slots 32 --score-original \
    ${LIMIT:+--limit "$LIMIT"}

log "done; final artifacts:"
ls -1 "$EVAL" | sed 's/^/  /'
python - "$EVAL" <<'EOF'
import glob, json, sys
paths = sorted(glob.glob(sys.argv[1] + "/textvqa_accuracy_*.json"))
if paths:
    d = json.load(open(paths[-1]))
    keys = ("overall_warped_accuracy", "overall_original_accuracy",
            "accuracy_gain", "total_samples_evaluated")
    print({k: d[k] for k in keys if k in d})
EOF
