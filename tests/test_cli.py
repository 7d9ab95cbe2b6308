"""CLI entry points: scaled-down end-to-end runs on the synthetic dataset."""

import json
import os

import pytest


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_run_train_synthetic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    rc = main([
        "data.dataset=synthetic", "data.global_batch_size=8",
        "data.num_workers=2",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "task.grid_size=3",
        "train.epochs=1", "train.log_every=5", "train.ckpt_every=1000000",
        f"train.results_dir={tmp_path}/results",
        "diffusion.sampling_steps=4",
    ])
    assert rc == 0
    runs = os.listdir(tmp_path / "results")
    assert len(runs) == 1
    exp = tmp_path / "results" / runs[0]
    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    assert any("train_loss" in m for m in metrics)
    # final validation goes into the summary record
    assert any("val_puzzle_acc" in str(m) for m in metrics)
    assert (exp / "checkpoints").exists()


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_run_train_multi_grid(tmp_path, monkeypatch):
    """task.multi_grid="2,3": one parameter set trains on both grids
    (steps cycle per grid) and validation reports per-grid metrics. The
    reference needs a separate model per grid (train_JPDVT.py vs
    train_JPDVT_4x4.py)."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    rc = main([
        "data.dataset=synthetic", "data.global_batch_size=8",
        "data.num_workers=2",
        # 96px / patch 16 = 6 tokens/side -> grids 2 and 3 both divide
        "model.image_size=96", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "task.grid_size=2", "task.multi_grid=2,3",
        "train.epochs=1", "train.log_every=5", "train.ckpt_every=1000000",
        f"train.results_dir={tmp_path}/results",
        "diffusion.sampling_steps=4",
    ])
    assert rc == 0
    runs = os.listdir(tmp_path / "results")
    exp = tmp_path / "results" / runs[0]
    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    text = str(metrics)
    assert "val_puzzle_acc_g2" in text and "val_puzzle_acc_g3" in text


def test_run_train_multi_grid_rejects_bad_grid(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    with pytest.raises(SystemExit, match="must divide"):
        # 96px / patch 16 = 6 tokens/side; grid 4 divides 96 but not 6
        main([
            "data.dataset=synthetic", "data.global_batch_size=8",
            "model.image_size=96", "model.depth=1", "model.hidden_size=32",
            "model.num_heads=2", "model.attn_impl=xla",
            "task.multi_grid=2,4",
            f"train.results_dir={tmp_path}/results",
        ])


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_run_train_crop_validation(tmp_path, monkeypatch):
    """task.crop=true: validation must inner-crop val images to the model
    size (regression: 288px batches fed to a crop-trained 192px... here
    144px model crashed at the first checkpoint validation)."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    rc = main([
        "data.dataset=synthetic", "data.global_batch_size=8",
        "data.num_workers=2",
        # crop path: loads 288px synthetic, inner-crops 96->48 pieces -> 144
        "model.image_size=144", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "task.grid_size=3", "task.crop=true",
        "train.epochs=1", "train.log_every=50", "train.ckpt_every=1000000",
        f"train.results_dir={tmp_path}/results",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
    ])
    assert rc == 0


def test_run_eval_synthetic(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.eval.run_eval import main

    rc = main([
        "data.dataset=synthetic",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "diffusion.sampling_steps=3", "diffusion.sampler_mode=fast",
        "eval.batch_size=8", "eval.limit=16",
        f"eval.logs_dir={tmp_path}/logs",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "puzzle_accuracy=" in out
    assert os.path.exists(tmp_path / "logs" / "inference_progress.csv")


def test_run_eval_sequence_parallel(tmp_path, monkeypatch, capsys):
    # mesh.seq=2 on the virtual 8-device mesh: context-parallel eval via
    # ring attention (the model is built with attn_impl=ring + a
    # (data, seq) mesh; 48px/patch-16 -> 9 tokens is indivisible, so use
    # patch 8 -> 36 tokens -> 18 per shard).
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.eval.run_eval import main

    rc = main([
        "data.dataset=synthetic",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.patch_size=8",
        "model.compute_dtype=float32",
        "mesh.seq=2",
        "diffusion.sampling_steps=3", "diffusion.sampler_mode=fast",
        "eval.batch_size=8", "eval.limit=16",
        f"eval.logs_dir={tmp_path}/logs",
    ])
    assert rc == 0
    assert "puzzle_accuracy=" in capsys.readouterr().out


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_run_train_resume(tmp_path, monkeypatch):
    """Full-state CLI resume (reference train_JPDVT.py:239-274)."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    common = [
        "data.dataset=synthetic", "data.global_batch_size=8",
        "data.num_workers=2", "data.synthetic_n=64",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "train.log_every=4", "train.ckpt_every=8",
        f"train.results_dir={tmp_path}/results",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
    ]
    assert main(common + ["train.epochs=1"]) == 0
    run = os.listdir(tmp_path / "results")[0]
    ckpt_dir = str(tmp_path / "results" / run / "checkpoints")
    steps = [int(s) for s in os.listdir(ckpt_dir) if s.isdigit()]
    assert steps, "no checkpoint saved"

    # resume and train one more epoch: step counter continues
    assert main(common + ["train.epochs=1",
                          f"train.resume={ckpt_dir}"]) == 0
    steps2 = [int(s) for s in os.listdir(ckpt_dir) if s.isdigit()]
    assert max(steps2) > max(steps)

    # mistyped resume dir fails loudly
    import pytest

    with pytest.raises(FileNotFoundError):
        main(common + ["train.epochs=1",
                       f"train.resume={tmp_path}/nonexistent"])


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_run_train_warm_start(tmp_path, monkeypatch):
    """train.warm_start: a grid-3@48 checkpoint seeds a grid-6@96 run
    (the ladder mechanism). Unlike resume, new checkpoints land in the NEW
    run's exp_dir; the step counter carries over; EMA is reset to params
    with the warmup ramp re-armed (asserted at the unit level in
    tests/test_warm_start.py)."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    common = [
        "data.dataset=synthetic", "data.global_batch_size=8",
        "data.num_workers=2", "data.synthetic_n=32",
        "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "train.log_every=4", "train.ckpt_every=4", "train.ema_warmup=true",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
    ]
    assert main(common + ["model.image_size=48", "task.grid_size=3",
                          "train.epochs=1",
                          f"train.exp_dir={tmp_path}/rung3"]) == 0
    seed_dir = str(tmp_path / "rung3" / "checkpoints")
    seed_steps = [int(s) for s in os.listdir(seed_dir) if s.isdigit()]
    assert seed_steps

    assert main(common + ["model.image_size=96", "task.grid_size=6",
                          "train.epochs=1",
                          f"train.exp_dir={tmp_path}/rung6",
                          f"train.warm_start={seed_dir}"]) == 0
    # Saves go to the new rung's dir, continuing the step counter; the
    # seed rung's checkpoints are untouched.
    new_steps = [int(s) for s in os.listdir(tmp_path / "rung6" / "checkpoints")
                 if s.isdigit()]
    assert new_steps and min(new_steps) > max(seed_steps)
    assert [int(s) for s in os.listdir(seed_dir)
            if s.isdigit()] == seed_steps

    import pytest

    # warm_start and resume are mutually exclusive
    with pytest.raises(SystemExit):
        main(common + ["model.image_size=96", "task.grid_size=6",
                       "train.epochs=1",
                       f"train.exp_dir={tmp_path}/rung6b",
                       f"train.warm_start={seed_dir}",
                       f"train.resume={seed_dir}"])
    # empty warm-start dir fails loudly
    with pytest.raises(FileNotFoundError):
        main(common + ["model.image_size=96", "task.grid_size=6",
                       "train.epochs=1",
                       f"train.exp_dir={tmp_path}/rung6c",
                       f"train.warm_start={tmp_path}/nonexistent"])


def test_run_eval_texrec_dirs(tmp_path, monkeypatch, capsys):
    """Directory-loop texrec mode: per-dir CSVs, mask exclusion, summary."""
    import numpy as np
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    for sub in ("Downsampled1", "Downsampled2"):
        d = tmp_path / "texrec" / sub
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)).save(d / f"t{i}.jpg")
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
            d / "t9_mask.jpg")  # must be excluded

    from jpdvt_mt_ntnu_tpu.eval.run_eval import main

    rc = main([
        "eval.texrec_dirs=1", f"data.data_path={tmp_path}/texrec",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
        "eval.batch_size=4", f"eval.logs_dir={tmp_path}/logs",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "OVERALL RESULTS" in out
    assert "Downsampled1" in out and "Downsampled2" in out
    assert "n=3" in out  # mask file excluded
    csvs = [f for f in os.listdir(tmp_path / "logs") if f.endswith(".csv")]
    assert len(csvs) == 2
    assert any("Downsampled1" in c for c in csvs)


def test_config_overrides_and_errors():
    from jpdvt_mt_ntnu_tpu.utils.config import Config, apply_overrides

    cfg = apply_overrides(Config(), ["train.lr=3e-4", "task.add_mask=true",
                                     "--model.name=JPDVT-T"])
    assert cfg.train.lr == 3e-4
    assert cfg.task.add_mask is True
    assert cfg.model.name == "JPDVT-T"
    with pytest.raises(KeyError):
        apply_overrides(Config(), ["train.nonexistent=1"])
    with pytest.raises(ValueError):
        apply_overrides(Config(), ["garbage"])


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_run_train_waves_device_stream(tmp_path, monkeypatch):
    """waves + device_stream: fresh on-device batches every step (the
    infinite-data regime), resume continues the stream cursor."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    common = [
        "data.dataset=synthetic", "data.synthetic_cues=waves",
        "data.device_stream=true", "data.global_batch_size=8",
        "data.synthetic_n=24", "data.num_workers=1",
        "model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "task.grid_size=3", "task.shared_perm=false",
        "train.log_every=2", "train.ckpt_every=1000000",
        f"train.exp_dir={tmp_path}/exp",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
    ]
    assert main(common + ["train.epochs=1"]) == 0
    assert main(common + ["train.epochs=1",
                          f"train.resume={tmp_path}/exp/checkpoints"]) == 0
