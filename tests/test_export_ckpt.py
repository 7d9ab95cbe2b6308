"""Durable checkpoint export (tools/export_ckpt.py).

The rounds-3/4 ladder capstones died with the VM because checkpoints live
in git-ignored results/ (ROADMAP.md). The export tool turns the latest
Orbax checkpoint into committable split-npz parts + sha256 manifest and
proves restore in a fresh process. These tests pin: bf16 round-trip of the
EMA params, multi-part split/reassembly, integrity failure on corruption,
and the restore smoke rebuilding the model from the embedded run_config
and producing valid permutations."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.export_ckpt import export, reassemble, restore_smoke  # noqa: E402

from jpdvt_mt_ntnu_tpu.models import create_model  # noqa: E402
from jpdvt_mt_ntnu_tpu.train import CheckpointManager, create_train_state  # noqa: E402
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer  # noqa: E402
from jpdvt_mt_ntnu_tpu.utils.config import Config, apply_overrides  # noqa: E402

TINY = ["model.image_size=48", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "task.grid_size=3",
        "data.dataset=synthetic", "data.synthetic_cues=waves"]


@pytest.fixture()
def tiny_run(tmp_path):
    cfg = apply_overrides(Config(), TINY)
    model, model_cfg = create_model(cfg.model.name, cfg.model.image_size,
                                    **cfg.model.overrides())
    state = create_train_state(model, model_cfg, jax.random.key(0),
                               make_optimizer())
    run_dir = tmp_path / "run"
    ckpt_dir = run_dir / "checkpoints"
    mgr = CheckpointManager(str(ckpt_dir))
    mgr.save(state, metadata={"note": "test"})
    mgr.wait()
    mgr.close()
    (run_dir / "run_config.json").write_text(cfg.to_json())
    return cfg, state, str(ckpt_dir)


def test_export_and_restore_roundtrip(tiny_run, tmp_path):
    cfg, state, ckpt_dir = tiny_run
    out = tmp_path / "artifacts"
    # 1 MiB parts force a multi-part split even for the tiny model
    manifest_path = export(ckpt_dir, str(out), max_part_mb=1)
    manifest = json.loads(open(manifest_path).read())
    assert manifest["step"] == int(state.step)
    assert manifest["param_count"] == sum(
        int(x.size) for x in jax.tree.leaves(state.ema_params))
    assert all(p["bytes"] <= 1 << 20 for p in manifest["parts"])

    npz = tmp_path / "back.npz"
    reassemble(manifest_path, str(npz))
    from jpdvt_mt_ntnu_tpu.tools.torch_convert import load_npz_params

    params = load_npz_params(str(npz))
    # bf16 round-trip: exact to bf16 resolution, fp32 dtype on load
    flat_src = jax.tree.leaves(state.ema_params)
    flat_back = jax.tree.leaves(params)
    assert len(flat_src) == len(flat_back)
    for a, b in zip(flat_src, flat_back):
        assert b.dtype == np.float32
        np.testing.assert_allclose(
            np.asarray(a, np.float32), b, rtol=8e-3, atol=1e-6)


def test_restore_smoke_solves(tiny_run, tmp_path):
    _, _, ckpt_dir = tiny_run
    out = tmp_path / "artifacts"
    manifest_path = export(ckpt_dir, str(out), max_part_mb=90)
    report = restore_smoke(manifest_path, solve_n=2)
    assert report["integrity"] == "sha256 ok"
    assert report["pred_valid_permutations"] is True
    assert report["solve_n"] == 2 and report["grid_size"] == 3


def test_corrupt_part_detected(tiny_run, tmp_path):
    _, _, ckpt_dir = tiny_run
    out = tmp_path / "artifacts"
    manifest_path = export(ckpt_dir, str(out), max_part_mb=1)
    manifest = json.loads(open(manifest_path).read())
    victim = out / manifest["parts"][-1]["file"]
    data = bytearray(victim.read_bytes())
    data[len(data) // 2] ^= 0xFF
    victim.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="integrity failure"):
        reassemble(manifest_path, str(tmp_path / "bad.npz"))


def test_config_from_dict_roundtrip():
    from jpdvt_mt_ntnu_tpu.utils.config import config_from_dict

    cfg = apply_overrides(Config(), TINY + ["train.t_bias=2.0"])
    back = config_from_dict(json.loads(cfg.to_json()))
    assert back.to_dict() == cfg.to_dict()
    # unknown sections/keys are ignored, not fatal
    d = json.loads(cfg.to_json())
    d["model"]["not_a_field"] = 7
    d["not_a_section"] = {"x": 1}
    assert config_from_dict(d).model.image_size == 48
