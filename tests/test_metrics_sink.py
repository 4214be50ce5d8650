"""Metric sink: JSONL fallback behavior (wandb is absent in this env, so
init_metrics must land on JsonlRun and record everything)."""

import json

from attwarp_tpu.train.metrics import JsonlRun, init_metrics


def test_init_metrics_falls_back_to_jsonl(tmp_path):
    run = init_metrics(
        run_dir=tmp_path, project="p", entity=None, cfg={"lr": 1e-3}
    )
    assert isinstance(run, JsonlRun)  # wandb not installed here
    run.log({"loss/train_total": 0.5, "global_step": 1})
    run.log({"loss/train_total": 0.25}, step=2)
    run.define_metric("x")  # no-ops must exist (wandb interface)
    run.watch(None)
    run.log_artifact(None)
    assert run.summary["loss/train_total"] == 0.25
    run.finish()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl") if l.strip()]
    assert lines[0]["_type"] == "config" and lines[0]["config"]["lr"] == 1e-3
    assert lines[1]["loss/train_total"] == 0.5
    assert lines[2]["_step"] == 2


def test_jsonl_run_skips_nonscalar(tmp_path):
    run = JsonlRun(tmp_path)
    run.log({"ok": 1.0, "bad": object()})
    run.finish()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl") if l.strip()]
    assert "ok" in lines[0] and "bad" not in lines[0]
