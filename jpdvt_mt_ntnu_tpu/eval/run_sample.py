"""Streaming quick-accuracy loop — port of reference image_model/sample.py.

Streams a dataset, solves batches, prints running accuracy, early-stops at
a target count (2000 for MET, 50000 for ImageNet — sample.py:205-208).
Optional crop-split chunk mode reproduces the gap augmentation at eval
(sample.py:123-136 / the --crop training path).

Usage:
    python -m jpdvt_mt_ntnu_tpu.eval.run_sample data.dataset=synthetic \
        eval.limit=2000 model.image_size=192
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import create_diffusion
from ..models import create_model
from ..ops import jigsaw
from ..utils.config import Config, apply_overrides
from .run_eval import build_dataset, load_params
from .solver import PuzzleSolver

_DEFAULT_LIMITS = {"met": 2000, "imagenet": 50000}


def main(argv=None) -> int:
    from ..utils.platform import (apply_matmul_precision, ensure_platform,
                                  init_compilation_cache)

    ensure_platform()
    init_compilation_cache()
    argv = sys.argv[1:] if argv is None else argv
    crop = any(a.startswith("sample.crop") for a in argv)
    argv = [a for a in argv if not a.startswith("sample.crop")]
    cfg = apply_overrides(Config(), argv)
    apply_matmul_precision(cfg.model.matmul_precision)
    limit = cfg.eval.limit or _DEFAULT_LIMITS.get(cfg.data.dataset, 2000)

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model, model_cfg = create_model(cfg.model.name, cfg.model.image_size,
                                    dtype=dtype, attn_impl=cfg.model.attn_impl,
                                    **cfg.model.overrides())
    params = load_params(cfg, model, model_cfg)
    solver = PuzzleSolver(model, model_cfg,
                          create_diffusion(str(cfg.diffusion.sampling_steps)),
                          grid_size=cfg.task.grid_size,
                          mode=cfg.diffusion.sampler_mode, seed=cfg.eval.seed)
    if crop:
        # Gap-augmentation needs the larger source image (288 -> inner-crop
        # to image_size), mirroring the training-side load (run_train
        # build_datasets); loading at image_size would make the inner crop
        # an identity no-op.
        import dataclasses as _dc

        big = _dc.replace(cfg.model, image_size=288)
        cfg_big = _dc.replace(cfg, model=big)
        dataset = build_dataset(cfg_big)
    else:
        dataset = build_dataset(cfg)
    grid = cfg.task.grid_size
    p = grid * grid
    bs = cfg.eval.batch_size
    rng = jax.random.key(cfg.eval.seed)
    puzzle = patch = count = 0
    t0 = time.time()
    for start in range(0, min(limit, len(dataset)), bs):
        items = [dataset[i] for i in range(start, min(start + bs, limit,
                                                      len(dataset)))]
        batch = jnp.asarray(np.stack(items))
        if crop:
            batch = jigsaw.inner_crop_pieces(
                batch, grid, cfg.model.image_size // grid)
        rng, sub = jax.random.split(rng)
        res = solver.evaluate(params, batch, sub)
        puzzle += int(res.puzzle_correct.sum())
        patch += int(res.patch_matches.sum())
        count += len(items)
        print(f"{count}/{limit}: running puzzleAcc={puzzle / count:.4f} "
              f"patchAcc={patch / (count * p):.4f} "
              f"({count / (time.time() - t0):.2f} puzzles/s)")
    print(f"FINAL: n={count} puzzle={puzzle / max(1, count):.4f} "
          f"patch={patch / max(1, count * p):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
