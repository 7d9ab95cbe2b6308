"""Step-by-step single-image walk-through (notebook replacement).

Scripted equivalent of the reference's ``ak_sample_visualize.ipynb``
(SURVEY.md §2.1): load an image, scramble it, run the reverse diffusion,
recover the permutation, and render every stage to one panel.

    python examples/demo_walkthrough.py [--image path] [--checkpoint ckpt] \
        [--out walkthrough.png] [--steps 250] [--mode faithful]

Without --image a synthetic texture is used; without --checkpoint the model
is randomly initialized (the pipeline still runs end-to-end — expect a
wrong permutation).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jpdvt_mt_ntnu_tpu.utils.platform import ensure_platform

ensure_platform()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--model", default="JPDVT")
    ap.add_argument("--image-size", type=int, default=192)
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--mode", default="faithful")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="walkthrough.png")
    # scaled-down overrides
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("--hidden-size", type=int, default=0)
    ap.add_argument("--num-heads", type=int, default=0)
    a = ap.parse_args()

    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles
    from jpdvt_mt_ntnu_tpu.data import transforms as T
    from jpdvt_mt_ntnu_tpu.eval.run_eval import load_params
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
    from jpdvt_mt_ntnu_tpu.models import create_model
    from jpdvt_mt_ntnu_tpu.tools.val_panel import render_panel
    from jpdvt_mt_ntnu_tpu.utils.config import Config

    # 1) Load / synthesize the clean image.
    if a.image:
        from PIL import Image

        img = T.normalize(T.to_array(T.center_crop_arr(
            Image.open(a.image).convert("RGB"), a.image_size)))
    else:
        img = SyntheticPuzzles(a.image_size, n=1, seed=a.seed)[0]
    print(f"image: {img.shape}, range [{img.min():.2f}, {img.max():.2f}]")

    # 2) Build model + solver.
    overrides = {k: v for k, v in dict(depth=a.depth, hidden_size=a.hidden_size,
                                       num_heads=a.num_heads).items() if v}
    model, cfg = create_model(a.model, a.image_size, **overrides)
    c = Config()
    c.eval.checkpoint = a.checkpoint
    params = load_params(c, model, cfg)
    solver = PuzzleSolver(model, cfg, create_diffusion(str(a.steps)),
                          grid_size=a.grid, mode=a.mode, seed=a.seed)

    # 3) Scramble with a random permutation.
    x = jnp.asarray(img)[None]
    scrambled, indices = solver.scramble(x, jax.random.key(a.seed))
    print(f"scramble permutation: {np.asarray(indices)[0].tolist()}")

    # 4) Reverse diffusion -> per-token codes -> greedy assignment.
    pred = solver.solve(params, scrambled)
    print(f"predicted slots:      {pred[0].tolist()}")

    # 5) Re-place pieces + metrics.
    recon = solver.reconstruct(scrambled, pred)
    correct = (pred[0] == np.asarray(indices)[0])
    print(f"puzzle solved: {bool(correct.all())} "
          f"({int(correct.sum())}/{a.grid**2} pieces)")

    render_panel([{
        "title": f"solved={bool(correct.all())} "
                 f"({int(correct.sum())}/{a.grid ** 2})",
        "original": img,
        "scrambled": np.asarray(scrambled)[0],
        "reconstructed": np.asarray(recon)[0],
    }], a.out)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
