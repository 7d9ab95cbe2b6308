"""scripts/parity_when_available.sh — the one-command parity path for when
the reference's 2850000.pt / ImageNet appear (VERDICT r3 item 8).

Smoke-tested here against the same tiny reference-format fixture the
checkpoint rehearsal uses (tests/test_ckpt_rehearsal.py): convert ->
activation-compare -> fp32 run_eval must run end to end and report.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = dict(input_size=96, patch_size=16, in_channels=3, hidden_size=64,
           depth=2, num_heads=4, mlp_ratio=4.0, code_dim=8,
           code_head_hidden=64)


@pytest.mark.slow
def test_parity_script_end_to_end(tmp_path):
    from PIL import Image

    from jpdvt_mt_ntnu_tpu.tools.make_dit_goldens import (
        build_torch_dit, torch_state_dict_for_convert)

    sd = torch_state_dict_for_convert(build_torch_dit(CFG, seed=3))
    ckpt = {"model": {k: v + 0.01 for k, v in sd.items()}, "ema": sd,
            "opt": {}, "args": {"model": "JPDVT", "image_size": 96},
            "train_steps": 2850000}
    pt = tmp_path / "2850000.pt"
    torch.save(ckpt, pt)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (128, 128, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"im{i}.jpg")

    env = dict(os.environ,
               PARITY_OUT=str(tmp_path / "out"),
               AC_ARGS="--image-size 96 --depth 2 --hidden-size 64 "
                       "--num-heads 4",
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out_file = tmp_path / "stdout.log"  # NEVER pipe: XLA warnings deadlock
    with open(out_file, "w") as fh:
        rc = subprocess.call(
            ["bash", os.path.join(REPO, "scripts/parity_when_available.sh"),
             str(pt), str(img_dir),
             "model.image_size=96", "model.depth=2", "model.hidden_size=64",
             "model.num_heads=4", "model.attn_impl=xla", "task.grid_size=3",
             "eval.batch_size=4", "eval.limit=4",
             "diffusion.sampling_steps=2"],
            stdout=fh, stderr=subprocess.STDOUT, cwd=REPO,
            env=env, timeout=900)
    text = out_file.read_text()
    assert rc == 0, text[-2000:]
    assert "activation_compare: OK" in text
    assert "puzzle_accuracy=" in text
    # the converted npz + journal landed where the script says they do
    assert (tmp_path / "out" / "2850000_ema.npz").exists()
    assert (tmp_path / "out" / "logs").exists()
