"""Op-level device profile of the train step or the faithful solve.

Captures an XLA profiler trace (works over the axon remote-TPU tunnel),
parses the Perfetto JSON the profiler writes, and prints the top device
ops aggregated by fusion name — the tool behind PERF.md's roofline
tables ("the faithful-solve roofline", "the train step"):

    python tools/profile_step.py --what train --batch 96
    python tools/profile_step.py --what solve --batch 32 --top 30

The summary aggregates total device-time per op name across the traced
steps, so per-block fusions (12 DiT blocks) fold into one row with a
call count. Host-side / dispatch tracks are excluded — only events on
device lanes count.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_train(args):
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.models import create_model
    from jpdvt_mt_ntnu_tpu.train.state import create_train_state, make_optimizer
    from jpdvt_mt_ntnu_tpu.train.steps import TrainTask, make_train_step
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    model, cfg = create_model(args.model, args.image_size, dtype=jnp.bfloat16)
    opt = make_optimizer(lr=1e-4)
    task = TrainTask(grid_size=args.grid,
                     block_size=args.image_size // args.grid,
                     patch_size=cfg.patch_size)
    step = make_train_step(model, create_diffusion(), opt, task,
                           jnp.asarray(grid_code(cfg.code_dim, args.grid)),
                           fused_adamw=dict(lr=1e-4, weight_decay=0.0))
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    x = (jax.random.normal(jax.random.key(1),
                           (args.batch, args.image_size, args.image_size, 3))
         .astype(jnp.bfloat16) * 0.5)
    rng = jax.random.key(2)

    def run(n):
        nonlocal state
        for _ in range(n):
            state, m = step(state, x, rng)
        return jax.tree.leaves(state.params)[0]

    return run


def build_solve(args):
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
    from jpdvt_mt_ntnu_tpu.models import create_model

    model, cfg = create_model(args.model, args.image_size, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, args.image_size, args.image_size, 3)),
                        jnp.array([0]), jnp.zeros((1, cfg.num_tokens, 8)))
    solver = PuzzleSolver(model, cfg, create_diffusion("250"),
                          grid_size=args.grid, mode="faithful")
    x = jax.random.normal(jax.random.key(1),
                          (args.batch, args.image_size, args.image_size, 3))

    def run(n):
        r = None
        for _ in range(n):
            r = solver._solve_codes(params, x)
        return r[1]

    return run


def device_op_events(trace_dir: str) -> list[dict]:
    """Individual HLO executions from the "XLA Ops" device lane.

    The profiler's Perfetto export gives each device several lanes
    ("Steps", "XLA Modules", "XLA Ops"); only the op lane holds individual
    HLO executions — summing across lanes would triple-count the step.
    Each returned dict: {name, dur (us), category, bytes, long_name}.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pnames.items()
                   if "TPU" in n or "TensorCore" in n or "device" in n.lower()}
    op_lanes = {k for k, n in tnames.items()
                if k[0] in device_pids and n == "XLA Ops"}
    out = []
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        args = e.get("args", {})
        out.append({
            "name": e.get("name", "?"),
            "dur": float(e.get("dur", 0.0)),
            "category": args.get("hlo_category", "?"),
            "bytes": int(args.get("bytes_accessed", 0) or 0),
            "long_name": args.get("long_name", ""),
        })
    return out


def main() -> None:
    from jpdvt_mt_ntnu_tpu.utils.platform import ensure_platform
    from jpdvt_mt_ntnu_tpu.utils.profiling import trace

    ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["train", "solve"], default="train")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--model", default="JPDVT")
    ap.add_argument("--image-size", type=int, default=192)
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3,
                    help="steps to trace (after 4 warmup/compile steps)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="", help="keep the raw trace here")
    args = ap.parse_args()

    run = (build_train if args.what == "train" else build_solve)(args)
    float(jnp.sum(run(4)))                       # compile + warm, drain
    out = args.out or tempfile.mkdtemp(prefix="jpdvt_prof_")
    with trace(out):
        float(jnp.sum(run(args.steps)))          # one D2H fence inside trace

    evs = device_op_events(out)
    total = sum(e["dur"] for e in evs)
    print(f"# device total: {total / 1e3:.2f} ms over {args.steps} "
          f"{args.what} steps (batch {args.batch}) -> "
          f"{total / 1e3 / args.steps:.2f} ms/step")

    by_cat: dict = collections.defaultdict(lambda: [0.0, 0, 0])
    for e in evs:
        c = by_cat[e["category"]]
        c[0] += e["dur"]
        c[1] += 1
        c[2] += e["bytes"]
    print(f"\n{'us/step':>10} {'%':>6} {'calls':>6} {'GB/s':>7}  category")
    for cat, (us, calls, nbytes) in sorted(by_cat.items(),
                                           key=lambda kv: -kv[1][0]):
        bw = nbytes / (us * 1e-6) / 1e9 if us else 0.0
        print(f"{us / args.steps:10.1f} {100 * us / total:5.1f}% "
              f"{calls // args.steps:6d} {bw:7.0f}  {cat}")

    by_op: dict = collections.defaultdict(lambda: [0.0, 0, 0, "", ""])
    for e in evs:
        o = by_op[e["name"]]
        o[0] += e["dur"]
        o[1] += 1
        o[2] += e["bytes"]
        o[3] = e["category"]
        o[4] = e["long_name"]
    print(f"\n{'us/step':>10} {'%':>6} {'calls':>6} {'GB/s':>7}  op "
          "(output shape)")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])
    for name, (us, calls, nbytes, cat, long_name) in rows[:args.top]:
        bw = nbytes / (us * 1e-6) / 1e9 if us else 0.0
        shape = long_name.split(" = ")[-1].split(" fusion(")[0][:72]
        print(f"{us / args.steps:10.1f} {100 * us / total:5.1f}% "
              f"{calls // args.steps:6d} {bw:7.0f}  {name} [{cat}] {shape}")
    if not args.out:
        print(f"(raw trace kept in {out})")


if __name__ == "__main__":
    main()
