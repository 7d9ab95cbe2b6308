"""Checkpoint diagnostic: x0-code accuracy vs timestep, plus all samplers.

When a training run reads "chance" it can mean three different things:
the model never learned (no gradient entry point), the model learned but
the EMA hasn't caught up yet, or the sampler chain destroys a signal the
single-step prediction already carries. This probe separates them, the
way the round-3 "waves" saga was diagnosed:

1. For a ladder of timesteps t, feed the model pure-noise codes at that t
   and greedy-assign its x0 code prediction directly — NO sampler chain.
   Accuracy >> chance at any t means the model HAS the relational/cue
   signal; flat chance at every t means training truly failed.
2. Run the full faithful / iterative / ddim solvers on the same batch so
   the single-step numbers can be compared with the chained ones.
3. With --raw, probe the raw training weights instead of EMA (EMA decay
   .9999 needs ~20k steps to track a fast-converging function; a stream
   run had solved its task by ~5k steps while EMA validation still read
   chance — PERF.md round 3).

Usage:
    python -m jpdvt_mt_ntnu_tpu.tools.probe_checkpoint \
        eval.checkpoint=results/run/checkpoints data.synthetic_cues=waves \
        [eval.use_ema=false] [task.grid_size=4] [eval.batch_size=32]

Reference comparison: the reference has no such tool — its only training
signal is the loss curve (train_JPDVT.py:260-266); accuracy problems
surface after the fact in inference.py runs.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

PROBE_TIMESTEPS = (999, 900, 700, 400, 100, 10, 0)


def main(argv=None) -> int:
    from ..utils.platform import (apply_matmul_precision, ensure_platform,
                                  init_compilation_cache)

    ensure_platform()
    init_compilation_cache()
    argv = sys.argv[1:] if argv is None else argv

    from ..core.diffusion import create_diffusion
    from ..data.datasets import SyntheticPuzzles
    from ..eval.run_eval import build_dataset, load_params
    from ..eval.solver import PuzzleSolver
    from ..models import create_model
    from ..ops import assignment, jigsaw
    from ..utils.config import Config, apply_overrides
    from ..utils.pos_embed import grid_code

    cfg = apply_overrides(Config(), argv)
    apply_matmul_precision(cfg.model.matmul_precision)
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model, mcfg = create_model(cfg.model.name, cfg.model.image_size,
                               dtype=dtype, attn_impl=cfg.model.attn_impl,
                               **cfg.model.overrides())
    params = load_params(cfg, model, mcfg)
    which = "ema" if cfg.eval.use_ema else "raw"

    b = cfg.eval.batch_size
    grid = cfg.task.grid_size
    ds = build_dataset(cfg)
    if isinstance(ds, SyntheticPuzzles) and ds.cues == "waves":
        x = ds.device_batcher()(range(b)).astype(jnp.float32)
    else:
        x = jnp.stack([jnp.asarray(ds[i]) for i in range(min(b, len(ds)))])
    b = x.shape[0]

    solver = PuzzleSolver(model, mcfg, create_diffusion(
        str(cfg.diffusion.sampling_steps)), grid_size=grid, seed=cfg.eval.seed)
    idx = jigsaw.random_permutations(jax.random.key(cfg.eval.seed + 5),
                                     b, grid * grid)
    x_scr = jigsaw.scramble(x, idx, grid)
    canon = jnp.asarray(grid_code(mcfg.code_dim, grid))
    idx_np = np.asarray(idx)

    @jax.jit
    def probe(params, x_scr, t):
        noise = jnp.broadcast_to(solver.noise_template,
                                 (b, mcfg.num_tokens, mcfg.code_dim))
        _, code = model.apply(params, x_scr, jnp.full((b,), t, jnp.int32),
                              noise)
        pieces = jigsaw.tokens_to_piece_code(code, grid, solver.sub)
        dist = assignment.manhattan_distances(pieces, canon)
        return assignment.greedy_permutation(dist)

    print(f"probe: {which} weights, {b} images, grid {grid}, "
          f"cues={cfg.data.synthetic_cues or cfg.data.dataset}")
    for t in PROBE_TIMESTEPS:
        eq = np.asarray(probe(params, x_scr, t)) == idx_np
        print(f"t={t:4d} noise-code x0-pred: puzzle={eq.all(-1).mean():.3f} "
              f"patch={eq.mean():.3f}", flush=True)

    for mode in ("faithful", "iterative", "ddim"):
        s = PuzzleSolver(model, mcfg,
                         create_diffusion(str(cfg.diffusion.sampling_steps)),
                         grid_size=grid, mode=mode, seed=cfg.eval.seed)
        eq = np.asarray(s.solve(params, x_scr)) == idx_np
        print(f"solver mode={mode}: puzzle={eq.all(-1).mean():.3f} "
              f"patch={eq.mean():.3f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
