"""Smoke test for the sampler trade-off table tool on the trained fixture."""

import os

import pytest

# Long-running parity suite: excluded from the fast tier (pytest -m 'not slow');
# the FULL suite remains the round gate (README quick start shows both).
pytestmark = pytest.mark.slow

from jpdvt_mt_ntnu_tpu.tools import sampler_table

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_jpdvt_48px.npz")


def test_sampler_table_tool(tmp_path, monkeypatch):
    monkeypatch.setattr(sampler_table, "SWEEP", (
        ("faithful-10", "faithful", "10"),
        ("ddim-10", "ddim", "ddim10"),
        ("fast", "fast", "10"),
    ))
    monkeypatch.setattr(sampler_table, "BENCH_TARGET_S", 0.05)
    rc = sampler_table.main([
        f"eval.checkpoint={FIXTURE}",
        "model.image_size=48", "model.depth=2", "model.hidden_size=64",
        "model.num_heads=4", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "eval.limit=16", f"eval.logs_dir={tmp_path}",
    ])
    assert rc == 0
    md = (tmp_path / "sampler_table_grid3.md").read_text()
    csv = (tmp_path / "sampler_table_grid3.csv").read_text()
    # three swept samplers, all solving the fixture's task
    lines = [l for l in csv.splitlines()[1:] if l]
    assert len(lines) == 3
    for line in lines:
        _, _, _, pacc, _, tput, n = line.split(",")
        assert float(pacc) >= 0.9
        assert float(tput) > 0
        assert int(n) == 16
    assert "faithful-10" in md and "ddim-10" in md
