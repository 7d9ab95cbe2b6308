"""Masked-puzzle demo: zero out pieces before solving.

Scripted equivalent of the reference's
``inference_visualize_missing_patches.ipynb`` (SURVEY.md §2.1): scramble an
image, black out selected pieces of the scrambled input (``SKIPPED_PATCHES``
in the notebook), solve, and render the panel. Models trained with
``task.add_mask=true`` learn to place pieces even with missing evidence.

    python examples/masked_patches_demo.py --skip 0 4 [--image path] ...
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
    ap.add_argument("--skip", type=int, nargs="*", default=[0, 4],
                    help="scrambled-slot indices to zero out")
    ap.add_argument("--out", default="masked_demo.png")
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
    from jpdvt_mt_ntnu_tpu.ops import jigsaw
    from jpdvt_mt_ntnu_tpu.tools.val_panel import render_panel
    from jpdvt_mt_ntnu_tpu.utils.config import Config

    if a.image:
        from PIL import Image

        img = T.normalize(T.to_array(T.center_crop_arr(
            Image.open(a.image).convert("RGB"), a.image_size)))
    else:
        img = SyntheticPuzzles(a.image_size, n=1, seed=a.seed)[0]

    overrides = {k: v for k, v in dict(depth=a.depth, hidden_size=a.hidden_size,
                                       num_heads=a.num_heads).items() if v}
    model, cfg = create_model(a.model, a.image_size, **overrides)
    c = Config()
    c.eval.checkpoint = a.checkpoint
    params = load_params(c, model, cfg)
    solver = PuzzleSolver(model, cfg, create_diffusion(str(a.steps)),
                          grid_size=a.grid, mode=a.mode, seed=a.seed)

    x = jnp.asarray(img)[None]
    scrambled, indices = solver.scramble(x, jax.random.key(a.seed))

    # Zero the selected scrambled slots (the notebook's SKIPPED_PATCHES).
    p = a.grid ** 2
    piece_mask = np.ones((1, p), dtype=np.float32)
    for s in a.skip:
        piece_mask[0, s] = 0.0
    mask_img = jigsaw.piece_mask_to_image(
        jnp.asarray(piece_mask), a.grid, a.image_size // a.grid, 3)
    masked = scrambled * mask_img
    print(f"zeroed scrambled slots: {sorted(a.skip)}")

    pred = solver.solve(params, masked)
    recon = solver.reconstruct(scrambled, pred)  # re-place ORIGINAL pieces
    correct = pred[0] == np.asarray(indices)[0]
    print(f"permutation: {np.asarray(indices)[0].tolist()}")
    print(f"predicted:   {pred[0].tolist()}")
    print(f"solved: {bool(correct.all())} ({int(correct.sum())}/{p})")

    render_panel([{
        "title": f"masked slots {sorted(a.skip)}; "
                 f"solved={bool(correct.all())} ({int(correct.sum())}/{p})",
        "original": img,
        "scrambled": np.asarray(masked)[0],
        "reconstructed": np.asarray(recon)[0],
    }], a.out)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
