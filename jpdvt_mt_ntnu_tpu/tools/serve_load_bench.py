"""Real-chip serving load benchmark: MicroBatcher vs one-program-per-request.

Drives the actual serving solve path (PuzzleSolver fast mode on the real
TPU) under N concurrent client threads, once through the MicroBatcher
(padded batch programs) and once serially (one program per request, the
reference app's execution model — api/app.py:250-348), and reports
throughput and p50/p99 latency for PERF.md.

Usage (real TPU; keep it the only TPU process):
    python -m jpdvt_mt_ntnu_tpu.tools.serve_load_bench [n_clients] [max_batch]
"""

from __future__ import annotations

import sys
import threading
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ..core.diffusion import create_diffusion
    from ..eval.solver import PuzzleSolver
    from ..models import create_model
    from ..serve.plugins import MicroBatcher
    from ..utils.platform import init_compilation_cache

    init_compilation_cache()
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    model, cfg = create_model("JPDVT", input_size=192, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 192, 192, 3)),
                        jnp.array([0]), jnp.zeros((1, cfg.num_tokens, 8)))
    solver = PuzzleSolver(model, cfg, create_diffusion("250"), grid_size=3,
                          mode="fast", microbatch=0)

    def solve_fn(xs):
        return solver.solve(params, jnp.asarray(xs))

    rng = np.random.default_rng(0)
    images = rng.standard_normal((n_clients, 192, 192, 3)).astype(np.float32)
    # Warm both compiled shapes (batch=max_batch for the batcher, 1 for serial).
    solve_fn(images[:max_batch])
    solve_fn(images[:1])

    def run_concurrent(submit):
        lat = np.zeros(n_clients)
        barrier = threading.Barrier(n_clients)

        def client(i):
            barrier.wait()
            t0 = time.perf_counter()
            submit(images[i:i + 1][0])
            lat[i] = time.perf_counter() - t0

        ts = [threading.Thread(target=client, args=(i,))
              for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join(300)
        wall = time.perf_counter() - t0
        assert (lat > 0).all(), "request starved"
        p50, p99 = np.percentile(lat, [50, 99])
        return wall, p50, p99

    batcher = MicroBatcher(solve_fn, max_batch=max_batch, window_ms=5.0)
    wall_b, p50_b, p99_b = run_concurrent(
        lambda img: batcher.solve(img, timeout=300.0))
    batcher.shutdown()

    lock = threading.Lock()  # serial baseline: one program per request

    def serial(img):
        with lock:
            return solve_fn(img[None])

    wall_s, p50_s, p99_s = run_concurrent(serial)

    print(f"clients={n_clients} max_batch={max_batch}")
    print(f"micro-batched: wall={wall_b*1e3:.0f}ms "
          f"({n_clients/wall_b:.1f} req/s) p50={p50_b*1e3:.0f}ms "
          f"p99={p99_b*1e3:.0f}ms  [{batcher.batches_run} programs]")
    print(f"per-request  : wall={wall_s*1e3:.0f}ms "
          f"({n_clients/wall_s:.1f} req/s) p50={p50_s*1e3:.0f}ms "
          f"p99={p99_s*1e3:.0f}ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
