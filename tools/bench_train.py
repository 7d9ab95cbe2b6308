"""Train-step throughput shootout: fused single-pass AdamW+EMA vs optax.

Times the full jitted training step (jigsaw shuffle, q-sample, fwd, bwd,
optimizer, EMA) on the flagship geometry with each optimizer path:

    python tools/bench_train.py [--steps 50] [--batch 96] [--model JPDVT]
                                [--image-size 192] [--grid 3]

Measurement follows the environment rules (ROADMAP.md "Environment
gotchas"): dispatch all steps back-to-back (each depends on the donated
state of the previous, so the device serializes them) and sync ONCE at
the end with a D2H read of a param leaf of the final state —
per-call timings and bare ``block_until_ready`` lie on this backend.

Reference comparison: the reference's torch trainer interleaves
``opt.step()`` + ``update_ema`` as separate CUDA launches per param
(train_JPDVT.py:366-369); here both variants are one XLA program and the
fused path collapses the optimizer segment into one read/write fusion per
leaf (state.fused_adamw_ema).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fused: bool, args) -> dict:
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.models import create_model
    from jpdvt_mt_ntnu_tpu.train.state import create_train_state, make_optimizer
    from jpdvt_mt_ntnu_tpu.train.steps import TrainTask, make_train_step
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    model, cfg = create_model(args.model, args.image_size, dtype=jnp.bfloat16,
                              attn_impl=args.attn)
    diffusion = create_diffusion()
    optimizer = make_optimizer(lr=1e-4, weight_decay=0.0)
    task = TrainTask(grid_size=args.grid,
                     block_size=args.image_size // args.grid,
                     patch_size=cfg.patch_size)
    code = jnp.asarray(grid_code(cfg.code_dim, args.grid))
    step = make_train_step(
        model, diffusion, optimizer, task, code,
        fused_adamw=dict(lr=1e-4, weight_decay=0.0) if fused else None)
    state = create_train_state(model, cfg, jax.random.key(0), optimizer)
    rng = jax.random.key(1)
    batch = jax.device_put(jnp.zeros(
        (args.batch, args.image_size, args.image_size, 3), jnp.bfloat16))

    state, m = step(state, batch, rng)          # compile + warm
    for _ in range(3):
        state, m = step(state, batch, rng)
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # drain the queue

    t0 = time.time()
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # ONE final D2H sync
    dt = time.time() - t0
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    return {
        "optimizer_path": "fused_adamw_ema" if fused else "optax_chain",
        "ms_per_step": round(dt / args.steps * 1e3, 2),
        "steps_per_sec": round(args.steps / dt, 2),
        "imgs_per_sec": round(args.steps * args.batch / dt, 1),
        "params_m": round(n_params / 1e6, 1),
        "batch": args.batch,
    }


def main() -> None:
    from jpdvt_mt_ntnu_tpu.utils.platform import ensure_platform

    ensure_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--model", default="JPDVT")
    p.add_argument("--image-size", type=int, default=192)
    p.add_argument("--grid", type=int, default=3)
    p.add_argument("--only", choices=["fused", "optax"], default=None)
    # None = the production auto-route (ops/attention.default_impl);
    # explicit values pin an impl for shootouts at new geometries.
    p.add_argument("--attn", default=None,
                   choices=[None, "xla", "pallas", "flash", "block"])
    args = p.parse_args()
    for fused in ((args.only == "fused",) if args.only
                  else (False, True)):
        print(json.dumps(bench(fused, args)), flush=True)


if __name__ == "__main__":
    main()
