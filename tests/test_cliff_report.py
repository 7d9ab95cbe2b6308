"""Pin tools/cliff_report.py — the hard-region yardstick for the 20x20
cliff interventions (PERF.md "20x20 plateau").

The region classification must stay in lockstep with the draw stream in
data/datasets.py:_wave_params AND with the oversampler
(data.synthetic_hard_frac): if either drifts, curriculum experiments
would be scored against a different region than they trained on.
"""

import csv
import subprocess
import sys
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOURNAL = os.path.join(REPO, "logs", "waves20_r4_eval",
                       "inference_progress.csv")


def test_region_fraction_matches_measured_prevalence():
    """Seed-11 natural stream: the committed analysis found 90/1024 draws
    (8.79%) in the hard region; the classifier must reproduce it."""
    sys.path.insert(0, REPO)
    from tools.cliff_report import classify

    n_in = sum(classify(i, 11, 1.2, 0.85)[0] for i in range(1024))
    assert n_in == 90


def test_hard_frac_draws_land_in_region():
    """Every hard_frac-forced draw must be classified IN-region by the
    report tool's OWN predicate (classify_params is shared between the
    tool and this test precisely so threshold drift in either the
    oversampler or the yardstick fails here — ADVICE r4)."""
    sys.path.insert(0, REPO)
    from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles
    from tools.cliff_report import classify_params

    ds = SyntheticPuzzles(64, n=64, seed=3, cues="waves", hard_frac=1.0)
    for i in range(64):
        th, f, ph, amp = ds._wave_params(i)
        hard, k, _, fm = classify_params(th, f, amp, 1.2, 0.85)
        assert hard, (i, th, f)
        assert k == 2
        assert fm > 0.85


def test_cli_reproduces_committed_r4_numbers(tmp_path):
    """End-to-end CLI on the committed round-4 journal: 30.0% in-region vs
    3.75% out-of-region failure at 0.9395 overall."""
    out = tmp_path / "cliff.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    subprocess.run(
        [sys.executable, "tools/cliff_report.py", JOURNAL,
         "--seed", "11", "--grid", "20", "--out", str(out)],
        cwd=REPO, env=env, check=True, capture_output=True)
    rep = json.loads(out.read_text())
    assert rep["n"] == 1024
    assert rep["grid_slots"] == 400
    assert rep["n_in_region"] == 90
    assert abs(rep["fail_rate_in"] - 0.30) < 1e-6
    assert abs(rep["fail_rate_out"] - 0.0375) < 1e-3
    assert abs(rep["puzzle_acc"] - 0.9395) < 1e-4
