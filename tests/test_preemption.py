"""Elastic training: clean preemption checkpoint + auto-resume (upgrade
over the reference, which loses everything since its last epoch save)."""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "data.dataset=synthetic", "data.global_batch_size=8",
    "data.num_workers=2", "data.synthetic_n=64",
    "model.image_size=48", "model.depth=1", "model.hidden_size=32",
    "model.num_heads=2", "model.attn_impl=xla", "model.compute_dtype=float32",
    "train.log_every=2", "train.ckpt_every=1000000",
    "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
]


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
    exp = tmp_path / "exp"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=REPO)
    # Output goes to a FILE, not a PIPE: nobody drains a pipe during the
    # poll loop below, and a chatty backend (e.g. XLA:CPU AOT cache
    # reload warnings) can fill the 64 KB buffer and deadlock the child
    # before its first training step.
    outpath = tmp_path / "train_out.txt"
    outfile = open(outpath, "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "jpdvt_mt_ntnu_tpu.train.run_train",
         f"train.exp_dir={exp}", "train.epochs=10000"] + COMMON,
        env=env, cwd=str(tmp_path),
        stdout=outfile, stderr=subprocess.STDOUT, text=True)

    # wait until it is actually stepping (first logged window)
    metrics = exp / "metrics.jsonl"
    # Generous: this covers subprocess interpreter + jit bring-up on a
    # loaded single-core CI box, not the steady-state step rate.
    deadline = time.time() + 600
    while time.time() < deadline:
        if metrics.exists() and "train_loss" in metrics.read_text():
            break
        if proc.poll() is not None:
            outfile.close()
            raise AssertionError(f"train died early:\n{outpath.read_text()}")
        time.sleep(0.5)
    else:
        proc.kill()
        outfile.close()
        raise AssertionError("training never reached the first log window")

    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=180)
    outfile.close()
    out = outpath.read_text()
    assert proc.returncode == 42, f"expected PREEMPTED_EXIT:\n{out}"
    assert "Preempted: checkpoint saved" in out

    ckpts = [int(s) for s in os.listdir(exp / "checkpoints") if s.isdigit()]
    assert ckpts, "no preemption checkpoint written"

    # Resume exactly as the autoresume wrapper would: same-style relaunch
    # with train.resume. train.epochs is an ABSOLUTE budget anchored at the
    # exp dir's persisted start step (step_anchor.json, anchor 0 here), so
    # the resumed run trains only the remainder — pick a budget whose
    # target (epochs * 8 steps/epoch) lands past the preempted step, else
    # the budget is already spent and the run correctly exits untouched.
    steps_per_epoch = 64 // 8  # synthetic_n / global_batch_size (COMMON)
    resume_epochs = max(ckpts) // steps_per_epoch + 1
    rc = subprocess.run(
        [sys.executable, "-m", "jpdvt_mt_ntnu_tpu.train.run_train",
         f"train.exp_dir={exp}", f"train.resume={exp}/checkpoints",
         f"train.epochs={resume_epochs}"] + COMMON,
        env=env, cwd=str(tmp_path), capture_output=True, text=True)
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert f"Resumed from step {max(ckpts)}" in rc.stdout + rc.stderr
    final = [int(s) for s in os.listdir(exp / "checkpoints") if s.isdigit()]
    assert max(final) > max(ckpts)
