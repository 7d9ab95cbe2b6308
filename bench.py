"""Headline benchmark: puzzles/sec/chip on 3x3 ImageNet-192-class solving.

Runs the flagship JPDVT (131M params) with the parity sampler — the full
250-step faithful reverse diffusion, identical step count and math to the
reference's metric-defining path (reference: image_model/inference.py:281-290,
~0.8 puzzles/s on the baseline GPU at batch 1). The whole solve is one jitted
XLA program; throughput comes from batching + bf16 + the Pallas attention
kernel.

Prints ONE JSON line:
  {"metric": "puzzles_per_sec_per_chip", "value": N, "unit": "puzzles/s",
   "vs_baseline": N / 0.8, ...}

Extra context (batch size, fast-mode equivalent throughput) goes to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_PUZZLES_PER_SEC = 0.8  # BASELINE.md row 1: 1.25 s/img, batch 1
STEPS = 250
IMAGE_SIZE = 192
GRID = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(mode: str, batch: int):
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
    from jpdvt_mt_ntnu_tpu.models import create_model

    model, cfg = create_model("JPDVT", input_size=IMAGE_SIZE,
                              dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3)),
                        jnp.array([0]), jnp.zeros((1, cfg.num_tokens, 8)))
    diffusion = create_diffusion(str(STEPS))
    solver = PuzzleSolver(model, cfg, diffusion, grid_size=GRID, mode=mode)
    x = jax.random.normal(jax.random.key(1),
                          (batch, IMAGE_SIZE, IMAGE_SIZE, 3))
    return solver, params, x


def throughput(solver, params, x, iters: int = 3) -> float:
    res = solver.evaluate(params, x, jax.random.key(2))  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        res = solver.evaluate(params, x, jax.random.key(3 + i))
    dt = (time.perf_counter() - t0) / iters
    assert res.pred.shape == (x.shape[0], GRID * GRID)
    return x.shape[0] / dt


def throughput_back_to_back(solver, params, x, iters: int = 20) -> float:
    """Steady-state throughput: back-to-back async solves, one final sync.

    For sub-100ms programs the per-call host round trip (remote-tunnel
    dispatch + D2H of the metrics) dominates `throughput()`; this measures
    the serving-relevant pipelined rate instead.

    The fence is ONE actual D2H readback (`float(jnp.sum(...))`) — on the
    remote-tunnel backend `block_until_ready` alone can return before the
    device work drains, inflating the number (round-2 lesson; the round-2
    "4,975 p/s" figure was measured with the unreliable idiom and is
    superseded by this one).
    """
    r = solver._solve_codes(params, x)
    float(jnp.sum(r[1]))  # warm + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        r = solver._solve_codes(params, x)
    float(jnp.sum(r[1]))  # one final D2H readback fences the whole run
    return x.shape[0] / ((time.perf_counter() - t0) / iters)


def faithful_flops_per_puzzle(cfg, steps: int = STEPS) -> float:
    """Analytic bf16 FLOPs of one faithful solve (dense matmuls + attention;
    elementwise ignored). The condition embedding is hoisted out of the
    scan (solver.py), so it counts once; each of the ``steps`` model calls
    counts the full DiT stack on N tokens."""
    n, d = cfg.num_tokens, cfg.hidden_size
    m = int(cfg.mlp_ratio * d)
    pd = cfg.patch_dim
    per_fwd = (
        2 * n * cfg.code_dim * d            # code_in
        + 2 * 256 * d + 2 * d * d           # t_embedder MLP
        + cfg.depth * (
            2 * n * d * 3 * d               # qkv
            + 4 * n * n * d                 # scores + weighted sum
            + 2 * n * d * d                 # proj
            + 2 * (2 * n * d * m)           # mlp fc1+fc2
            + 2 * d * 6 * d)                # adaLN
        + 2 * n * d * pd + 2 * d * 2 * d    # final layer
        + 2 * n * (pd * cfg.code_head_hidden
                   + cfg.code_head_hidden * cfg.code_dim))
    return steps * per_fwd + 2 * n * pd * d  # + one condition embed


V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s per chip


def main():
    import sys

    from jpdvt_mt_ntnu_tpu.utils.platform import init_compilation_cache

    init_compilation_cache()
    n_chips = jax.local_device_count()
    log(f"backend={jax.default_backend()} chips={n_chips}")

    # Batch 128 with the solver's auto micro-batching (lax.map over chunks
    # of 32 — the measured per-program optimum on v5e) is the round-2
    # headline config; pass --full to re-sweep (each config is a fresh,
    # slow remote compile).
    batches = (32, 64, 128) if "--full" in sys.argv else (128,)
    best, best_batch = 0.0, 0
    flops_per_puzzle = None
    for batch in batches:
        solver, params, x = build("faithful", batch)
        flops_per_puzzle = faithful_flops_per_puzzle(solver.cfg)
        tp = throughput(solver, params, x)
        log(f"faithful {STEPS}-step batch={batch}: {tp:.2f} puzzles/s")
        if tp > best:
            best, best_batch = tp, batch
        del solver, params, x

    # Secondary: the mathematically-equivalent single-step fast path.
    # Its program is ~27 ms — measure pipelined (back-to-back) so the
    # remote-tunnel per-call round trip doesn't dominate.
    solver, params, x = build("fast", 128)
    fast_tp = throughput_back_to_back(solver, params, x)
    log(f"fast-equivalent batch=128 (pipelined): {fast_tp:.1f} puzzles/s")

    value = best / n_chips
    mfu = value * flops_per_puzzle / V5E_BF16_PEAK
    log(f"MFU (faithful): {mfu:.1%} of v5e bf16 peak "
        f"({flops_per_puzzle / 1e12:.2f} TFLOP/puzzle)")
    print(json.dumps({
        "metric": "puzzles_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "puzzles/s",
        "vs_baseline": round(value / BASELINE_PUZZLES_PER_SEC, 2),
        "config": f"3x3@{IMAGE_SIZE}, {STEPS}-step faithful, batch {best_batch}, bf16",
        "fast_mode_equivalent": round(fast_tp / n_chips, 1),
        "mfu": round(mfu, 3),
    }))


if __name__ == "__main__":
    main()
