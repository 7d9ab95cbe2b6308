"""In-training validation: solve real puzzles with the current weights.

Port of the reference's ``validate_model`` (train_JPDVT.py:503-642): at each
checkpoint, sample val images, scramble with random permutations, run the
full 250-step sampler, recover permutations and report puzzle/patch
accuracy. Here it is one batched jitted solve instead of a 100-iteration
Python loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..core.diffusion import create_diffusion
from ..eval.solver import PuzzleSolver


class Validator:
    def __init__(self, model, model_cfg, *, grid_size: int = 3,
                 sampling_steps="250", num_images: int = 100,
                 batch_size: int = 50, seed: int = 42,
                 sampler_mode: str = "faithful",
                 crop_pieces: Optional[int] = None):
        diffusion = create_diffusion(str(sampling_steps))
        self.solver = PuzzleSolver(model, model_cfg, diffusion,
                                   grid_size=grid_size, mode=sampler_mode,
                                   seed=seed)
        self.num_images = num_images
        self.batch_size = batch_size
        self.seed = seed
        # task.crop trains on gap-augmented pieces cut from larger images
        # (288 -> 192); validation must apply the same transform or the
        # model sees wrongly-sized inputs.
        self.crop_pieces = crop_pieces

    def __call__(self, params, dataset) -> dict:
        """Evaluate on up to num_images items of ``dataset``. Returns
        {"val_puzzle_acc", "val_patch_acc", "val_n"}."""
        rng = np.random.default_rng(self.seed)
        n = min(self.num_images, len(dataset))
        picks = rng.choice(len(dataset), size=n, replace=False)
        puzzle = patch = 0
        p = self.solver.grid ** 2
        for i in range(0, n, self.batch_size):
            batch = np.stack([dataset[int(j)] for j in picks[i:i + self.batch_size]])
            if self.crop_pieces is not None:
                from ..ops import jigsaw
                import jax.numpy as jnp

                batch = np.asarray(jigsaw.inner_crop_pieces(
                    jnp.asarray(batch), self.solver.grid, self.crop_pieces))
            res = self.solver.evaluate(params, batch,
                                       jax.random.key(self.seed + i))
            puzzle += int(res.puzzle_correct.sum())
            patch += int(res.patch_matches.sum())
        return {
            "val_puzzle_acc": puzzle / n,
            "val_patch_acc": patch / (n * p),
            "val_n": n,
        }
