"""Int8 vs bf16 solve throughput on the real chip.

Measures the flagship JPDVT geometry (131M, N=144 @192 by default) with
and without model.quant=int8 (ops/quant.py) for both the fast 1-step and
the faithful 250-step samplers. The reference has no quantization story
(fp32/TF32 torch throughout, reference: image_model/train_JPDVT.py:5-6);
on v5e the MXU's int8 path doubles peak over bf16 (394 vs 197 TOP/s).

Timing uses back-to-back async dispatch with ONE final D2H readback
(`float(jnp.sum(...))`) — `block_until_ready` alone returns early on the
remote-tunnel backend (ROADMAP "Environment gotchas").

Usage:  python tools/bench_quant.py [--image-size 192] [--batch 128]
        [--iters 20] [--faithful-iters 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(mode, batch, image_size, quant):
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
    from jpdvt_mt_ntnu_tpu.models import create_model

    model, cfg = create_model("JPDVT", input_size=image_size,
                              dtype=jnp.bfloat16, quant=quant)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, image_size, image_size, 3)),
                        jnp.array([0]), jnp.zeros((1, cfg.num_tokens, 8)))
    solver = PuzzleSolver(model, cfg, create_diffusion("250"), grid_size=3,
                          mode=mode)
    x = jax.random.normal(jax.random.key(1),
                          (batch, image_size, image_size, 3))
    return solver, params, x


def pipelined(solver, params, x, iters):
    r = solver._solve_codes(params, x)
    float(jnp.sum(r[1]))  # warm (compile) + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        r = solver._solve_codes(params, x)
    float(jnp.sum(r[1]))  # one final D2H readback fences the whole run
    return x.shape[0] / ((time.perf_counter() - t0) / iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=192)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--faithful-iters", type=int, default=3)
    ap.add_argument("--quants", default="bf16,int8",
                    help="comma list: bf16 | int8 | int8:K (selective)")
    a = ap.parse_args()

    from jpdvt_mt_ntnu_tpu.utils.platform import init_compilation_cache
    init_compilation_cache()
    log(f"backend={jax.default_backend()} image_size={a.image_size} "
        f"batch={a.batch}")

    quants = [q.strip() for q in a.quants.split(",") if q.strip()]
    rows = {}
    for mode, iters in (("fast", a.iters), ("faithful", a.faithful_iters)):
        for quant in quants:
            q = None if quant == "bf16" else quant
            solver, params, x = build(mode, a.batch, a.image_size, q)
            tp = pipelined(solver, params, x, iters)
            rows[f"{mode}_{quant}"] = round(tp, 2)
            log(f"{mode:9s} quant={quant:7s}: {tp:10.2f} puzzles/s")
            del solver, params, x
    for mode in ("fast", "faithful"):
        base = rows.get(f"{mode}_bf16")
        if not base:
            continue
        for quant in quants:
            if quant == "bf16":
                continue
            ratio = rows[f"{mode}_{quant}"] / base
            rows[f"{mode}_{quant}_speedup"] = round(ratio, 3)
            log(f"{mode}: {quant} is {ratio:.2f}x bf16")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
