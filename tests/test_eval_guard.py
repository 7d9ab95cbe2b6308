"""Checkpoint/eval config mismatch guard (run_eval.check_metadata_compat).

The reference's '4_Fail' run evaluated 18k images with a 3x3-style config
against a 4x4 checkpoint and journaled 0.0000 accuracy (reference
logs/4_Fail, SURVEY.md §6); every checkpoint-loading CLI here refuses
that class of run unless eval.allow_mismatch=true.
"""

import jax
import jax.numpy as jnp
import pytest

from jpdvt_mt_ntnu_tpu.eval.run_eval import check_metadata_compat, load_params
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.utils.config import Config


def _meta(name="JPDVT", size=192, grid=3):
    return {"config": {"model": {"name": name, "image_size": size},
                       "task": {"grid_size": grid}},
            "step": 1}


def test_compat_clean():
    assert check_metadata_compat(_meta(), Config()) == []


def test_compat_reports_each_field():
    cfg = Config()
    cfg.model.name = "JPDVT-T"
    cfg.model.image_size = 256
    cfg.task.grid_size = 4
    lines = check_metadata_compat(_meta(), cfg)
    assert len(lines) == 3
    assert any("grid_size" in ln for ln in lines)


def test_compat_multi_grid_membership():
    """A multi-grid checkpoint is valid at every grid it trained on."""
    meta = _meta()
    meta["config"]["task"]["multi_grid"] = "3,4,6,12"
    cfg = Config()
    for g in (3, 4, 6, 12):
        cfg.task.grid_size = g
        assert check_metadata_compat(meta, cfg) == []
    cfg.task.grid_size = 8
    lines = check_metadata_compat(meta, cfg)
    assert len(lines) == 1 and "grid_size" in lines[0]


def test_compat_tolerates_absent_metadata():
    # Old/foreign checkpoints without metadata must stay loadable.
    assert check_metadata_compat({}, Config()) == []
    assert check_metadata_compat(None, Config()) == []


def test_load_params_refuses_mismatched_checkpoint(tmp_path):
    from jpdvt_mt_ntnu_tpu.train import CheckpointManager, create_train_state
    from jpdvt_mt_ntnu_tpu.train.state import make_optimizer

    model, mcfg = create_model("JPDVT", input_size=48, depth=1,
                               hidden_size=32, num_heads=2, attn_impl="xla")
    state = create_train_state(model, mcfg, jax.random.key(0),
                               make_optimizer())
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, metadata=_meta(grid=4))
    mgr.wait()
    mgr.close()

    cfg = Config()
    cfg.eval.checkpoint = str(tmp_path / "ckpt")
    cfg.model.depth = 1
    cfg.model.hidden_size = 32
    cfg.model.num_heads = 2
    cfg.task.grid_size = 3  # conflicts with trained grid 4
    with pytest.raises(SystemExit, match="grid_size"):
        load_params(cfg, model, mcfg)
    # The escape hatch loads (with a warning) for deliberate cross runs.
    cfg.eval.allow_mismatch = True
    params = load_params(cfg, model, mcfg)
    assert jax.tree.leaves(params)
