"""train.epochs is a TOTAL step budget across resumes.

A watchdog relaunch or preemption resume must train only the REMAINDER of
the budget, not re-add the whole thing — the round-5 pipeline sizes rungs
by wall-clock, and a late wedge on a 2.4h rung that doubled its step count
would blow the session deadline (the failure mode that truncated rounds 3
and 4). Fresh runs are unchanged: epochs * steps_per_epoch from step 0."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "data.dataset=synthetic", "data.global_batch_size=8",
    "data.num_workers=2", "data.synthetic_n=64",
    "model.image_size=48", "model.depth=1", "model.hidden_size=32",
    "model.num_heads=2", "model.attn_impl=xla", "model.compute_dtype=float32",
    "train.log_every=4", "train.ckpt_every=1000000",
    "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
]


def _run(tmp_path, name, *overrides):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=REPO)
    out = tmp_path / f"{name}.txt"
    # output to a FILE: a chatty XLA:CPU backend can fill a pipe and
    # deadlock the child (see tests/test_preemption.py)
    with open(out, "w") as f:
        code = subprocess.call(
            [sys.executable, "-m", "jpdvt_mt_ntnu_tpu.train.run_train",
             *TINY, *overrides],
            env=env, cwd=str(tmp_path), stdout=f, stderr=subprocess.STDOUT)
    assert code == 0, out.read_text()
    return out.read_text()


def _last_step(exp):
    rows = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    return max(r["step"] for r in rows)


def test_resume_trains_only_the_remainder(tmp_path):
    exp = tmp_path / "exp"
    # synthetic_n=64 / batch 8 -> 8 steps/epoch; 2 epochs -> target step 16
    log1 = _run(tmp_path, "fresh", f"train.exp_dir={exp}", "train.epochs=2")
    assert "target step 16" in log1
    assert _last_step(exp) == 16

    # same budget, resumed at 16: nothing left to train
    log2 = _run(tmp_path, "resume_same",
                f"train.exp_dir={exp}", "train.epochs=2",
                f"train.resume={exp}/checkpoints")
    assert _last_step(exp) == 16
    assert "(step=" not in log2.split("target step")[1], (
        "a resume at the target must not train further")

    # raised budget: trains exactly the remainder (16 -> 24)
    _run(tmp_path, "resume_more",
         f"train.exp_dir={exp}", "train.epochs=3",
         f"train.resume={exp}/checkpoints")
    assert _last_step(exp) == 24


def test_warm_start_gets_its_full_budget(tmp_path):
    """train.warm_start restores the DONOR's step counter (stream cursor +
    EMA ramp continuity), so the budget must anchor at that step: the new
    rung trains its full epochs on top, and ITS resumes (which drop the
    warm_start flag, like the watchdog does) keep the anchored target via
    the persisted step_anchor.json."""
    donor = tmp_path / "donor"
    _run(tmp_path, "donor", f"train.exp_dir={donor}", "train.epochs=2")
    assert _last_step(donor) == 16

    rung = tmp_path / "rung"
    log = _run(tmp_path, "warm", f"train.exp_dir={rung}", "train.epochs=2",
               f"train.warm_start={donor}/checkpoints")
    assert "anchor 16, target step 32" in log
    assert _last_step(rung) == 32
    anchor = json.loads((rung / "step_anchor.json").read_text())
    assert anchor == {"start_step": 16}

    # watchdog-style relaunch: resume from own checkpoints, no warm_start
    log2 = _run(tmp_path, "warm_resume", f"train.exp_dir={rung}",
                "train.epochs=2", f"train.resume={rung}/checkpoints")
    assert "anchor 16, target step 32" in log2
    assert _last_step(rung) == 32
