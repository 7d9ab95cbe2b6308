"""Perfect-vs-failed visual comparison panel.

Port of reference image_model/valwhiletrain.py (SURVEY.md §2.1): sample one
perfectly-solved and one failed case from a progress CSV, re-run the solver
on both, and render a 2x3 matplotlib panel
(original | scrambled | reconstructed per row, valwhiletrain.py:213-258).

Usage:
    python -m jpdvt_mt_ntnu_tpu.tools.val_panel \
        --csv logs/inference_progress.csv --data-dir /data/imagenet/test \
        --checkpoint ckpts/run1 --out panel.png
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def find_file(data_dir: str, filename: str) -> str | None:
    for dirpath, _, files in os.walk(data_dir):
        if filename in files:
            return os.path.join(dirpath, filename)
    return None


def render_panel(rows: list[dict], out_path: str) -> None:
    """rows: [{"title", "original", "scrambled", "reconstructed"}] with HWC
    [-1,1] arrays."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.transforms import denormalize

    fig, axes = plt.subplots(len(rows), 3, figsize=(10, 3.6 * len(rows)))
    axes = np.atleast_2d(axes)
    for r, row in enumerate(rows):
        for c, key in enumerate(("original", "scrambled", "reconstructed")):
            ax = axes[r, c]
            ax.imshow(denormalize(np.asarray(row[key])))
            ax.set_axis_off()
            if r == 0:
                ax.set_title(key)
        axes[r, 0].set_ylabel(row["title"])
        axes[r, 0].set_axis_on()
        axes[r, 0].get_xaxis().set_visible(False)
        axes[r, 0].get_yaxis().set_ticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from ..core.diffusion import create_diffusion
    from ..data import transforms as T
    from ..models import create_model
    from ..eval.run_eval import load_params
    from ..eval.solver import PuzzleSolver
    from ..utils.config import Config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--model", default="JPDVT")
    ap.add_argument("--image-size", type=int, default=192)
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--mode", default="faithful")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="val_panel.png")
    a = ap.parse_args(argv)

    df = pd.read_csv(a.csv)
    picks = []
    for label, mask in [("perfect", df["puzzle_correct"] == 1),
                        ("failed", df["puzzle_correct"] == 0)]:
        sub = df[mask]
        if len(sub):
            picks.append((label, sub.sample(1, random_state=a.seed)
                          ["filename"].iloc[0]))
    if not picks:
        print("CSV has no rows")
        return 1

    cfg = Config()
    cfg.eval.checkpoint = a.checkpoint
    model, model_cfg = create_model(a.model, a.image_size)
    params = load_params(cfg, model, model_cfg)
    solver = PuzzleSolver(model, model_cfg, create_diffusion(str(a.steps)),
                          grid_size=a.grid, mode=a.mode, seed=a.seed)

    from PIL import Image

    rows = []
    rng = jax.random.key(a.seed)
    for label, fname in picks:
        path = find_file(a.data_dir, fname)
        if path is None:
            print(f"warning: {fname} not under {a.data_dir}")
            continue
        img = T.normalize(T.to_array(
            T.center_crop_arr(Image.open(path).convert("RGB"), a.image_size)))
        x = jnp.asarray(img)[None]
        rng, sub = jax.random.split(rng)
        scrambled, indices = solver.scramble(x, sub)
        pred = solver.solve(params, scrambled)
        recon = solver.reconstruct(scrambled, pred)
        ok = bool((pred[0] == np.asarray(indices)[0]).all())
        rows.append({
            "title": f"{label} ({fname})\nsolved={ok}",
            "original": img,
            "scrambled": np.asarray(scrambled)[0],
            "reconstructed": np.asarray(recon)[0],
        })
    render_panel(rows, a.out)
    print(f"wrote {a.out} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
