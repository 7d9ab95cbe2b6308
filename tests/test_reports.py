"""metrics_report + run_sample CLIs over generated journals/datasets."""

import json

import numpy as np
import pandas as pd
import pytest


def _journal(tmp_path, n=50, correct=30):
    rows = []
    for i in range(n):
        ok = i < correct
        rows.append({"filename": f"img_{i:04d}.jpg",
                     "puzzle_correct": int(ok),
                     "patch_matches": 9 if ok else 3,
                     "time_s": 1.0 + 0.01 * i})
    path = tmp_path / "inference_progress.csv"
    pd.DataFrame(rows).to_csv(path, index=False)
    return str(path)


def test_metrics_report(tmp_path, capsys):
    from jpdvt_mt_ntnu_tpu.tools.metrics_report import main

    csv = _journal(tmp_path)
    hist = str(tmp_path / "hist.png")
    rc = main([csv, "--total-expected", "100", "--hist", hist])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["images_processed"] == 50
    assert rep["puzzle_accuracy"] == 0.6
    np.testing.assert_allclose(rep["patch_accuracy"],
                               (30 * 9 + 20 * 3) / (50 * 9))
    assert rep["unprocessed"] == 50
    assert rep["time"]["puzzles_per_sec"] > 0
    assert (tmp_path / "hist.png").exists()
    assert len(rep["examples"]["perfect"]) == 5


def test_metrics_report_merges_directory(tmp_path, capsys):
    from jpdvt_mt_ntnu_tpu.tools.metrics_report import load_journals

    _journal(tmp_path, n=10, correct=5)
    pd.DataFrame([{"filename": "x.jpg", "puzzle_correct": 1,
                   "patch_matches": 9, "time_s": 2.0}]).to_csv(
        tmp_path / "other_inference_progress_host1.csv", index=False)
    df = load_journals(str(tmp_path))
    assert len(df) == 11


def test_run_sample_synthetic(capsys):
    from jpdvt_mt_ntnu_tpu.eval.run_sample import main

    rc = main([
        "data.dataset=synthetic",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
        "eval.batch_size=8", "eval.limit=16",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FINAL: n=16" in out
    assert "running puzzleAcc=" in out
