"""Sampler trade-off table: accuracy AND throughput per sampler mode.

The reference has exactly one working sampler — the 250-step "faithful"
loop (reference: image_model/inference.py:281-290); its DDIM path is dead
code with a broken signature (gaussian_diffusion.py:546-553). This
framework carries four samplers (core/diffusion.py): the parity-faithful
loop, the corrected iterative chain, a WORKING DDIM, and the
mathematically-equivalent single-step fast path. This tool puts them side
by side on one trained checkpoint and one unseen image set: puzzle/patch
accuracy plus honestly-fenced throughput (back-to-back async solves, ONE
final D2H readback — per-call timings lie on the remote-tunnel backend).

Usage (real TPU, trained checkpoint):
    python -m jpdvt_mt_ntnu_tpu.tools.sampler_table \
        eval.checkpoint=results/waves_flagship/checkpoints \
        data.synthetic_cues=waves [task.grid_size=4] [eval.limit=512]

Writes <eval.logs_dir>/sampler_table_grid<G>.{md,csv}.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from ..core.diffusion import create_diffusion
from ..eval.run_eval import load_params
from ..eval.solver import PuzzleSolver
from ..models import create_model
from ..utils.config import Config, apply_overrides

# (label, sampler_mode, respacing) — the sweep. "fast" ignores the step
# count (single t=0 step, proven output-equal to faithful); it is listed
# with the faithful respacing for the table's "steps" column.
SWEEP = (
    ("faithful-250 (reference protocol)", "faithful", "250"),
    ("iterative-250 (corrected chain)", "iterative", "250"),
    ("ddim-50", "ddim", "ddim50"),
    ("ddim-25", "ddim", "ddim25"),
    ("ddim-10", "ddim", "ddim10"),
    ("fast (1-step equivalent)", "fast", "250"),
)


# Seconds of back-to-back device work per throughput measurement; tests
# shrink this (the tiny-model CPU smoke would otherwise spin thousands of
# iterations to fill the window).
BENCH_TARGET_S = 8.0


def measure_throughput(solver, params, x_bench, min_iters: int = 3,
                       target_s: float | None = None) -> float:
    """Pipelined puzzles/s: back-to-back jitted solves, one final sync."""
    import jax.numpy as jnp

    if target_s is None:
        target_s = BENCH_TARGET_S
    r = solver._solve_codes(params, x_bench)
    float(jnp.sum(r[1]))  # compile + drain
    # Calibrate iteration count so every mode (27 ms fast .. 5.7 s faithful)
    # runs ~target_s of device time.
    t0 = time.perf_counter()
    r = solver._solve_codes(params, x_bench)
    float(jnp.sum(r[1]))
    once = max(time.perf_counter() - t0, 1e-4)
    iters = max(min_iters, int(target_s / once))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = solver._solve_codes(params, x_bench)
    float(jnp.sum(r[1]))
    return x_bench.shape[0] / ((time.perf_counter() - t0) / iters)


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
    g = cfg.task.grid_size

    from ..data.datasets import SyntheticPuzzles

    n = cfg.eval.limit or 512
    ds = SyntheticPuzzles(cfg.model.image_size, n=n, seed=cfg.eval.seed + 1100,
                          cues=cfg.data.synthetic_cues or None)
    if ds.cues == "waves":
        x = np.asarray(ds.device_generate_all(), np.float32)[:n]
    else:
        x = np.stack([ds[i] for i in range(n)])
    x = jnp.asarray(x)
    bench_b = min(128, n)
    x_scr_bench = None

    os.makedirs(cfg.eval.logs_dir, exist_ok=True)
    md_path = os.path.join(cfg.eval.logs_dir, f"sampler_table_grid{g}.md")
    csv_path = os.path.join(cfg.eval.logs_dir, f"sampler_table_grid{g}.csv")
    rows = []
    for label, mode, respacing in SWEEP:
        diffusion = create_diffusion(respacing)
        solver = PuzzleSolver(model, model_cfg, diffusion, grid_size=g,
                              mode=mode, seed=cfg.eval.seed)
        res = solver.evaluate(params, x, jax.random.key(7))
        if x_scr_bench is None:
            x_scr_bench, _ = solver.scramble(x[:bench_b], jax.random.key(9))
        tp = measure_throughput(solver, params, x_scr_bench)
        rows.append((label, mode, respacing, res.puzzle_accuracy,
                     res.patch_accuracy, tp))
        print(f"{label}: puzzle={res.puzzle_accuracy:.4f} "
              f"patch={res.patch_accuracy:.4f} {tp:.1f} puzzles/s", flush=True)
        del solver, diffusion

    with open(md_path, "w") as f:
        f.write(f"# Sampler trade-off — grid {g}x{g}, {n} unseen images, "
                f"batch {bench_b}, ckpt={cfg.eval.checkpoint} "
                f"(ema={cfg.eval.use_ema})\n\n")
        f.write("| sampler | puzzle acc | patch acc | puzzles/s (pipelined) |\n")
        f.write("|---|---|---|---|\n")
        for label, mode, respacing, pa, ta, tp in rows:
            f.write(f"| {label} | {pa:.4f} | {ta:.4f} | {tp:.1f} |\n")
    with open(csv_path, "w") as f:
        f.write("label,mode,respacing,puzzle_acc,patch_acc,puzzles_per_s,n\n")
        for label, mode, respacing, pa, ta, tp in rows:
            f.write(f"{label},{mode},{respacing},{pa:.6f},{ta:.6f},"
                    f"{tp:.2f},{n}\n")
    print(f"wrote {md_path} and {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
