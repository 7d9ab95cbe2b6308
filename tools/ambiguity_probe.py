"""Measure placement-equivalence ambiguity behind puzzle-accuracy failures.

The `waves` regime draws 2-3 stationary plane waves per image. Strictly,
the joint field is identifiable from the piece multiset — but draws near
the sampler's floor (frequencies down to 0.25 cycles/image, pairwise
angles barely over the 0.5 rad spacing) produce fields whose level sets
make some pieces numerically interchangeable: swapping them changes the
reconstructed image by less than training noise. A model can place every
piece CONSISTENTLY with the field and still lose the all-pieces-right
puzzle metric on such draws.

This probe quantifies that: it solves N unseen puzzles (same dataset
construction as run_eval's synthetic path), reconstructs from the
predicted permutation, and scores each misplaced slot by the relative MSE
between the piece placed there and the piece that belongs there
(normalized by the piece's own variance). A misplacement with relMSE
below tolerance is PLACEMENT-EQUIVALENT — the prediction reconstructs an
image indistinguishable from the original at that slot — evidence of
task ambiguity, not model failure.

Reports raw puzzle/patch accuracy, the equivalence-tolerant accuracies,
and the relMSE distribution over misplaced slots. One JSON line at the
end for scripting.

Usage (mirrors the run_eval geometry flags):
  python tools/ambiguity_probe.py --image-size 320 --grid 20 \
      --checkpoint results/waves20_r4/checkpoints --seed 11 --n 512
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=320)
    ap.add_argument("--grid", type=int, default=20)
    ap.add_argument("--model", default="JPDVT")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cues", default="waves")
    ap.add_argument("--sampling-steps", default="250")
    ap.add_argument("--mode", default="faithful")
    ap.add_argument("--tols", default="0.001,0.01,0.05")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles
    from jpdvt_mt_ntnu_tpu.eval.run_eval import load_params
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
    from jpdvt_mt_ntnu_tpu.models import create_model
    from jpdvt_mt_ntnu_tpu.ops import jigsaw

    from jpdvt_mt_ntnu_tpu.utils.config import Config

    model, cfg = create_model(args.model, input_size=args.image_size,
                              dtype=jnp.bfloat16)
    full = Config()
    full.model.name = args.model
    full.model.image_size = args.image_size
    full.task.grid_size = args.grid
    full.eval.checkpoint = args.checkpoint
    params = load_params(full, model, cfg)
    solver = PuzzleSolver(model, cfg, create_diffusion(args.sampling_steps),
                          grid_size=args.grid, mode=args.mode)
    ds = SyntheticPuzzles(args.image_size, n=args.n, seed=args.seed,
                          cues=args.cues)
    grid = args.grid
    p = grid * grid
    tols = [float(t) for t in args.tols.split(",")]

    @jax.jit
    def slot_rel_mse(x, indices, pred):
        """(B,P) relative MSE per slot between recon-from-pred and x."""
        recon = jigsaw.unscramble(jigsaw.scramble(x, indices, grid), pred,
                                  grid)
        xp = jigsaw.to_pieces(x.astype(jnp.float32), grid)      # (B,P,h,w,C)
        rp = jigsaw.to_pieces(recon.astype(jnp.float32), grid)
        err = jnp.mean((xp - rp) ** 2, axis=(-1, -2, -3))
        var = jnp.var(xp, axis=(-1, -2, -3)) + 1e-8
        return err / var

    rng = np.random.default_rng(args.seed)
    mis_rel = []            # relMSE of every misplaced slot
    per_image = []          # (n_mis, n_equiv_at_tol0) per failed image
    puzzles = patches = 0
    eq_puzzles = [0] * len(tols)
    eq_patches = [0] * len(tols)
    count = 0
    for i in range(0, len(ds), args.batch):
        idxs = range(i, min(i + args.batch, len(ds)))
        x = jnp.asarray(np.stack([ds[j] for j in idxs]))
        key = jax.random.key(int(rng.integers(0, 2 ** 31)))
        res = solver.evaluate(params, x, key)
        rel = np.asarray(slot_rel_mse(x, jnp.asarray(res.indices),
                                      jnp.asarray(res.pred)))
        wrong = np.asarray(res.pred) != np.asarray(res.indices)
        # 'wrong' marks scrambled-piece rows; relMSE is per TARGET slot —
        # recover target slots of wrong pieces via pred itself.
        for b in range(rel.shape[0]):
            count += 1
            nm = int(wrong[b].sum())
            puzzles += int(nm == 0)
            patches += p - nm
            if nm == 0:
                continue
            slots = np.asarray(res.pred)[b][wrong[b]]
            r = rel[b][slots]
            mis_rel.extend(r.tolist())
            per_image.append((nm, int((r < tols[0]).sum())))
            for ti, tol in enumerate(tols):
                neq = int((r < tol).sum())
                eq_patches[ti] += neq
                eq_puzzles[ti] += int(neq == nm)
        print(f"{count} solved | raw puzzleAcc={puzzles / count:.4f}",
              flush=True)

    mis = np.asarray(mis_rel) if mis_rel else np.zeros(0)
    out = {
        "n": count, "grid": grid,
        "puzzle_acc": puzzles / count,
        "patch_acc": patches / (count * p),
        "misplaced_slots": int(mis.size),
        "rel_mse_quantiles": ({q: float(np.quantile(mis, q))
                               for q in (0.1, 0.5, 0.9, 0.99)}
                              if mis.size else {}),
    }
    for ti, tol in enumerate(tols):
        out[f"equiv_frac@{tol}"] = (float((mis < tol).mean())
                                    if mis.size else 1.0)
        out[f"puzzle_acc_equiv@{tol}"] = (puzzles + eq_puzzles[ti]) / count
        out[f"patch_acc_equiv@{tol}"] = ((patches + eq_patches[ti])
                                         / (count * p))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
