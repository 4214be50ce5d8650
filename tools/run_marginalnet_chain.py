"""Learned-warp evidence chain: driver -> train -> predict -> warp -> gain.

BASELINE config 3 end to end with the LEARNED (non-oracle) path — the
reference's entire L4 purpose (`model/marginalnet_full_dataset/trainer.py:
45-701` trains the net; `checkpoint_utils.py:133-204` warps from its
predicted CDFs), which round 2 proved only at unit level:

1. synthesize a code-tag TextVQA train set + a DISJOINT eval set
   (`testing/reader.py::write_textvqa_dataset`);
2. run the REAL driver (`cli/process_dataset.py --backend reader`) on the
   train set to produce oracle-attention artifacts;
3. train MarginalNet on those artifacts with the frozen reader-proxy
   feature extractor (`testing/reader.py::ReaderFeatureExtractor`) through
   the real `train_loop`;
4. for each EVAL image (never seen in training), predict marginals with
   the trained net and warp from the predicted CDFs
   (`marginalnet/inference.py::predict_and_warp`) — NO oracle attention
   pass — and write the driver's `saved_paths` metadata contract;
5. score warped-vs-original through the real harness
   (`cli/evaluate.py --model reader --score-original`);
6. write `eval_results/marginalnet_accuracy_gain.json`.

Run (CPU is fine):  JAX_PLATFORMS=cpu PYTHONPATH=.:$PYTHONPATH \\
    python tools/run_marginalnet_chain.py /tmp/mn_chain [--n-train 240]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser("run-marginalnet-chain")
    p.add_argument("workdir")
    p.add_argument("--n-train", type=int, default=240)
    p.add_argument("--n-eval", type=int, default=50)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--out-json", default="eval_results/marginalnet_accuracy_gain.json")
    p.add_argument("--geometry", choices=("center", "hard"), default="center",
                   help="'hard' = off-center varying-scale tags among "
                        "distractors (VERDICT r4 item 7 second geometry)")
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from attwarp_tpu.cli import evaluate as evaluate_cli
    from attwarp_tpu.cli import process_dataset as process_cli
    from attwarp_tpu.data.manifests import MetadataDirDataset
    from attwarp_tpu.marginalnet.inference import predict_and_warp
    from attwarp_tpu.testing.reader import (
        ReaderFeatureExtractor,
        write_textvqa_dataset,
    )
    from attwarp_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from attwarp_tpu.train.config import TrainConfig
    from attwarp_tpu.train.train_step import create_train_state
    from attwarp_tpu.train.trainer import prepare_batch, train_loop

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    t_all = time.time()

    # ── 1. datasets (disjoint seeds -> disjoint tag contents/positions) ──
    train_json, train_imgs = write_textvqa_dataset(
        os.path.join(wd, "train_data"), args.n_train, seed=100,
        geometry=args.geometry)
    eval_json, eval_imgs = write_textvqa_dataset(
        os.path.join(wd, "eval_data"), args.n_eval, seed=900,
        geometry=args.geometry)
    print(f"[chain] datasets: {args.n_train} train / {args.n_eval} eval "
          f"({args.geometry})")

    # ── 2. real driver on the train set (oracle artifacts) ─────────────
    proc_dir = os.path.join(wd, "processed_train")
    if not os.path.isdir(os.path.join(proc_dir, "metadata")) or not os.listdir(
            os.path.join(proc_dir, "metadata")):
        rc = process_cli.main([
            "--textvqa-json", train_json, "--image-dir", train_imgs,
            "--output-dir", proc_dir, "--backend", "reader",
            "--batch-size", "8",
        ])
        assert rc in (0, None), rc
    n_meta = len(os.listdir(os.path.join(proc_dir, "metadata")))
    print(f"[chain] driver artifacts: {n_meta} samples")

    # ── 3. train MarginalNet on the driver's artifacts ──────────────────
    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        image_size=args.image_size, vis_every=10_000, log_every=50,
        checkpoint_every_epochs=args.epochs,  # final checkpoint only
        experiments_root=os.path.join(wd, "experiments"),
        warmup_steps=0, alpha0=0.0, mllm_backend="mini",  # unused: feats injected
    )
    dataset = MetadataDirDataset(os.path.join(proc_dir, "metadata"),
                                 image_size=args.image_size)
    feats = ReaderFeatureExtractor()
    run_dir = train_loop(cfg, dataset=dataset, feature_extractor=feats)

    # restore the trained params
    from attwarp_tpu.data.loader import batch_iterator

    probe = next(batch_iterator(dataset, [0, 1], 2, drop_last=False))
    jprobe = prepare_batch(probe, feats)
    model, template = create_train_state(cfg, jax.random.PRNGKey(0), jprobe)
    ep, ckpt = latest_checkpoint(os.path.join(run_dir, "checkpoints"))
    state = restore_checkpoint(ckpt, template)
    print(f"[chain] trained; restored epoch-{ep} checkpoint")

    # ── 4. learned warp on the EVAL set (no oracle attention pass) ──────
    eval_meta = json.load(open(eval_json))["data"]
    out_root = os.path.join(wd, "learned_eval")
    meta_dir = os.path.join(out_root, "metadata")
    warp_dir = os.path.join(out_root, "warped_images")
    orig_dir = os.path.join(out_root, "original_images")
    for d in (meta_dir, warp_dir, orig_dir):
        os.makedirs(d, exist_ok=True)

    S = args.image_size
    B_EV = 10
    for start in range(0, len(eval_meta), B_EV):
        chunk = eval_meta[start:start + B_EV]
        imgs, qs = [], []
        for e in chunk:
            with Image.open(os.path.join(eval_imgs, f"{e['image_id']}.jpg")) as im:
                imgs.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
            qs.append(e["question"])
        batch = np.stack([
            np.asarray(Image.fromarray((im * 255).astype(np.uint8)).resize(
                (S, S), Image.BILINEAR), np.float32) / 255.0
            for im in imgs
        ])
        fmap = jnp.asarray(feats.visual_tokens(batch))
        ttok, tmask = feats.text_tokens(qs)
        warped, _px, _py = predict_and_warp(
            state.params, model, jnp.asarray(batch), fmap,
            jnp.asarray(ttok), jnp.asarray(tmask), out_size=(500, 500),
        )
        warped = np.clip(np.asarray(warped) * 255.0, 0, 255).astype(np.uint8)
        for e, im, w in zip(chunk, imgs, warped):
            sid = e["image_id"]
            wpath = os.path.join(warp_dir, f"{sid}_warped.png")
            opath = os.path.join(orig_dir, f"{sid}_original.png")
            Image.fromarray(w).save(wpath)
            Image.fromarray((im * 255).astype(np.uint8)).save(opath)
            with open(os.path.join(meta_dir, f"{sid}_metadata.json"), "w") as f:
                json.dump({
                    "sample_id": sid,
                    "question": e["question"],
                    "answers": e["answers"],
                    "saved_paths": {
                        "warped_image_identity": wpath,
                        "original_image": opath,
                    },
                }, f)
    print(f"[chain] learned-warped {len(eval_meta)} eval images")

    # ── 5. score through the real harness ───────────────────────────────
    def score(meta_path, out_dir):
        rc = evaluate_cli.main([
            "--metadata-dir", meta_path, "--output-dir", out_dir,
            "--model", "reader", "--score-original", "--batch-size", "8",
        ])
        assert rc in (0, None), rc
        finals = sorted(
            f for f in os.listdir(out_dir)
            if f.startswith("textvqa_accuracy_") and f.endswith(".json")
            and "interim" not in f
        )
        return json.load(open(os.path.join(out_dir, finals[-1])))

    final = score(meta_dir, os.path.join(wd, "eval_out"))

    # ── 5b. oracle path on the SAME eval set, at the driver's actual
    # input contract (VERDICT r3 item 8): the production driver warps from
    # the image-res MOTA mask (main.py:500-533 semantics), not from the
    # learned 24-bin profiles — run the real driver on the eval set and
    # score it with the same harness, so learned-vs-oracle compares at
    # identical data and identical (image-res-mask) warp semantics. The
    # learned TRAINING targets already come from that same mask
    # (MetadataDirDataset attention_key="mota"); the remaining 24x24-ness
    # of the learned path is MarginalNet's own output contract (24-bin
    # profiles right-inverse-upsampled to image res, reference trainer.py
    # :197,217-256), identical between training and inference.
    proc_eval = os.path.join(wd, "processed_eval")
    if not os.path.isdir(os.path.join(proc_eval, "metadata")) or not os.listdir(
            os.path.join(proc_eval, "metadata")):
        rc = process_cli.main([
            "--textvqa-json", eval_json, "--image-dir", eval_imgs,
            "--output-dir", proc_eval, "--backend", "reader",
            "--batch-size", "8",
        ])
        assert rc in (0, None), rc
    oracle = score(os.path.join(proc_eval, "metadata"),
                   os.path.join(wd, "eval_out_oracle"))
    final["oracle_same_eval_set"] = {
        "overall_warped_accuracy": oracle["overall_warped_accuracy"],
        "overall_original_accuracy": oracle.get("overall_original_accuracy"),
        "accuracy_gain": oracle.get("accuracy_gain"),
        "path": "driver image-res MOTA-mask warp (production contract)",
    }

    # ── 6. commit-ready artifact ────────────────────────────────────────
    final["model"] = "marginalnet+reader"
    final["geometry"] = args.geometry
    final["produced_by"] = (
        f"tools/run_marginalnet_chain.py: process_dataset --backend reader "
        f"(n={args.n_train}) -> train_loop ({args.epochs} epochs, bs "
        f"{args.batch_size}, image {S}px, ReaderFeatureExtractor frozen "
        f"features) -> predict_and_warp on a disjoint eval set "
        f"(n={args.n_eval}, NO oracle attention pass) -> cli.evaluate "
        f"--score-original"
    )
    os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(final, f, indent=2)
    print(f"[chain] done in {time.time()-t_all:.0f}s: "
          f"warped={final['overall_warped_accuracy']:.3f} "
          f"original={final.get('overall_original_accuracy')} "
          f"gain={final.get('accuracy_gain')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
