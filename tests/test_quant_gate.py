"""Per-checkpoint quantization gate (serve/service.py quant_gate).

Round 4 measured int8's accuracy cost to be CHECKPOINT-specific (PERF.md
"int8 at 16x16 revisited": 9.7pt collapse on one checkpoint, 1.0pt on
another, same geometry/code), so the serving layer must validate the
loaded weights at startup instead of trusting a one-time benchmark. These
tests pin the mechanism: the gate runs when quant is set, reports
int8-vs-float patch/puzzle disagreement, refuses in strict mode above
tolerance, warns in warn mode, and is skippable. The reference has no
quantized path at all (api/app.py serves the fp32 torch model)."""

import pytest

from jpdvt_mt_ntnu_tpu.serve.quant_gate import _translate_overrides
from jpdvt_mt_ntnu_tpu.serve.service import PuzzleService, ServiceConfig

TINY = dict(image_size=48, depth=1, hidden_size=32, num_heads=2,
            sampling_steps=2, sampler_mode="fast", compute_dtype="float32")


def test_gate_runs_and_reports():
    svc = PuzzleService(ServiceConfig(
        quant="int8", quant_gate="warn", quant_gate_n=4, **TINY))
    rep = svc.quant_gate_report
    assert rep is not None and rep["quant"] == "int8" and rep["n"] == 4
    assert 0.0 <= rep["patch_disagreement"] <= 1.0
    assert 0.0 <= rep["puzzle_disagreement"] <= 1.0
    # patch disagreement can't exceed puzzle disagreement == 0 case:
    # if no puzzle disagrees, no patch does either
    if rep["puzzle_disagreement"] == 0.0:
        assert rep["patch_disagreement"] == 0.0


def test_gate_strict_refuses_above_tol():
    # tol < 0 makes ANY disagreement level (including 0.0) a failure, so
    # the refusal path is exercised deterministically on random weights.
    with pytest.raises(RuntimeError, match="quant gate"):
        PuzzleService(ServiceConfig(
            quant="int8", quant_gate="strict", quant_gate_n=2,
            quant_gate_tol=-1.0, **TINY))


def test_gate_warn_does_not_refuse():
    svc = PuzzleService(ServiceConfig(
        quant="int8", quant_gate="warn", quant_gate_n=2,
        quant_gate_tol=-1.0, **TINY))
    assert svc.quant_gate_report is not None
    assert svc.quant_gate_report["passed"] is False


def test_gate_off_and_unquantized_skip():
    svc = PuzzleService(ServiceConfig(
        quant="int8", quant_gate="off", quant_gate_n=2, **TINY))
    assert svc.quant_gate_report is None
    svc = PuzzleService(ServiceConfig(quant_gate="strict", **TINY))
    assert svc.quant_gate_report is None  # no quant -> nothing to gate


def test_cli_override_translation():
    argv = _translate_overrides(
        ["model.name=JPDVT", "eval.checkpoint=ck", "task.grid_size=3",
         "--n", "8", "serve.quant_gate_out=g.json"])
    assert argv == ["--model", "JPDVT", "--checkpoint", "ck",
                    "--grid", "3", "--n", "8", "--out", "g.json"]


def test_models_endpoint_surfaces_gate_report():
    svc = PuzzleService(ServiceConfig(
        quant="int8", quant_gate="warn", quant_gate_n=2, **TINY))
    default = svc.models()[0]
    assert default["quant"] == "int8"
    assert default["quant_gate"] == svc.quant_gate_report
    # unquantized service keeps the original row shape (no gate keys)
    svc2 = PuzzleService(ServiceConfig(**TINY))
    assert "quant" not in svc2.models()[0]
