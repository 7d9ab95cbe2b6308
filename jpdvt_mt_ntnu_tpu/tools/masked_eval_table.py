"""Masked-puzzle parity table: accuracy vs number of hidden pieces.

Mirrors the reference's texrec-mask evaluation axis
(reference: image_model/inference_texrec.py:12-15 reports masked-run
accuracies; inference_visualize_missing_patches.ipynb zeroes selected
patches before solving) as one systematic sweep: for k = 0..max_masked
hidden pieces and BOTH fill protocols ("noise" = the masked-training
distribution, gaussian_diffusion.py:800; "zero" = the notebook's protocol),
solve a fixed unseen batch and report puzzle/patch accuracy.

Usage (real TPU, trained checkpoint):
    python -m jpdvt_mt_ntnu_tpu.tools.masked_eval_table \
        eval.checkpoint=results/natural16k_flagship/checkpoints \
        data.synthetic_cues=natural [task.grid_size=4 model.name=JPDVT-T \
        model.image_size=256] [eval.limit=256]

Writes a markdown table to <eval.logs_dir>/masked_table_grid<G>.md and a
CSV journal next to it.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..core.diffusion import create_diffusion
from ..eval.run_eval import load_params
from ..eval.solver import PuzzleSolver
from ..models import create_model
from ..utils.config import Config, apply_overrides


def main(argv=None) -> int:
    from ..utils.platform import ensure_platform, init_compilation_cache

    ensure_platform()
    init_compilation_cache()
    import jax.numpy as jnp

    cfg = apply_overrides(Config(), sys.argv[1:] if argv is None else argv)
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model, model_cfg = create_model(cfg.model.name, cfg.model.image_size,
                                    dtype=dtype, attn_impl=cfg.model.attn_impl,
                                    **cfg.model.overrides())
    params = load_params(cfg, model, model_cfg)
    diffusion = create_diffusion(str(cfg.diffusion.sampling_steps))
    g = cfg.task.grid_size
    solver = PuzzleSolver(model, model_cfg, diffusion, grid_size=g,
                          mode=cfg.diffusion.sampler_mode, seed=cfg.eval.seed)

    from ..data.datasets import SyntheticPuzzles

    n = cfg.eval.limit or 256
    ds = SyntheticPuzzles(cfg.model.image_size, n=n, seed=cfg.eval.seed + 900,
                          cues=cfg.data.synthetic_cues or None)
    if ds.cues == "waves":
        x = np.asarray(ds.device_generate_all(), np.float32)[:n]
    else:
        x = np.stack([ds[i] for i in range(n)])
    x = jnp.asarray(x)

    os.makedirs(cfg.eval.logs_dir, exist_ok=True)
    md_path = os.path.join(cfg.eval.logs_dir, f"masked_table_grid{g}.md")
    csv_path = os.path.join(cfg.eval.logs_dir, f"masked_table_grid{g}.csv")
    rows = []
    max_masked = g - 1
    for fill in ("noise", "zero"):
        for k in range(0, max_masked + 1):
            res = solver.evaluate_masked(params, x, jax.random.key(7), k,
                                         mask_fill=fill)
            rows.append((fill, k, res.puzzle_accuracy, res.patch_accuracy))
            print(f"fill={fill} hidden={k}: puzzle={res.puzzle_accuracy:.4f} "
                  f"patch={res.patch_accuracy:.4f} (n={n})", flush=True)
    with open(md_path, "w") as f:
        f.write(f"# Masked-puzzle sweep — grid {g}x{g}, "
                f"{cfg.diffusion.sampler_mode}-{cfg.diffusion.sampling_steps}, "
                f"{n} unseen images, ckpt={cfg.eval.checkpoint}\n\n")
        f.write("| fill | hidden pieces | puzzle acc | patch acc |\n")
        f.write("|---|---|---|---|\n")
        for fill, k, pa, ta in rows:
            f.write(f"| {fill} | {k} | {pa:.4f} | {ta:.4f} |\n")
    with open(csv_path, "w") as f:
        f.write("fill,hidden,puzzle_acc,patch_acc,n\n")
        for fill, k, pa, ta in rows:
            f.write(f"{fill},{k},{pa:.6f},{ta:.6f},{n}\n")
    print(f"wrote {md_path} and {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
