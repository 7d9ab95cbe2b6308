"""Serving latency on the real chip: concurrent clients vs the service layer.

The round-3 MicroBatcher load test (tests/test_serve_load.py) proves the
queueing behavior with a stubbed solver; this tool measures the REAL
thing — the flagship model on the TPU behind `PuzzleService` — under N
concurrent clients, with and without request micro-batching:

    python tools/bench_serve.py [--clients 32] [--mode fast]
                                [--window-ms 5] [--grid 3]

Prints one JSON line per configuration:
    {"mode": "fast", "batching": true, "clients": 32,
     "p50_ms": ..., "p99_ms": ..., "wall_s": ..., "puzzles_per_sec": ...}

Goes through `PuzzleService._solve_scrambled` — the exact path the HTTP
endpoints call (serve/app.py) minus PNG encode/decode, so the numbers
isolate device + queueing latency from host image codecs (the C++
decoder's 1.7 ms/img is measured separately in PERF.md).

Reference comparison: the reference api/app.py solves one request at a
time on the GPU with a per-request model call (api/app.py:250-348); its
measured single-puzzle latency is ~1.25 s (BASELINE.md row 1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_config(service, clients: int, mode: str) -> dict:
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal(
        (clients, service.cfg.image_size, service.cfg.image_size, 3)
    ).astype(np.float32) * 0.5
    latencies = np.zeros(clients)
    errors: list = []
    barrier = threading.Barrier(clients)

    def client(i):
        barrier.wait()
        t0 = time.perf_counter()
        try:
            pred, _ = service._solve_scrambled(imgs[i], mode)
            latencies[i] = time.perf_counter() - t0
            assert sorted(np.asarray(pred).tolist()) == list(
                range(service.cfg.grid_size ** 2))
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(errors[:3])
    p50, p99 = np.percentile(latencies, [50, 99])
    return {
        "mode": mode,
        "batching": service.cfg.batch_window_ms > 0,
        "clients": clients,
        "p50_ms": round(p50 * 1e3, 1),
        "p99_ms": round(p99 * 1e3, 1),
        "wall_s": round(wall, 2),
        "puzzles_per_sec": round(clients / wall, 1),
    }


def main() -> None:
    from jpdvt_mt_ntnu_tpu.utils.platform import ensure_platform

    ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--mode", default="fast", choices=["fast", "default"])
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--batch-max", type=int, default=8)
    ap.add_argument("--model", default="JPDVT")
    ap.add_argument("--image-size", type=int, default=192)
    ap.add_argument("--grid", type=int, default=3)
    args = ap.parse_args()

    from jpdvt_mt_ntnu_tpu.serve.service import PuzzleService, ServiceConfig

    for window in (0.0, args.window_ms):
        service = PuzzleService(ServiceConfig(
            model_name=args.model, image_size=args.image_size,
            grid_size=args.grid,
            sampler_mode="fast" if args.mode == "fast" else "faithful",
            batch_window_ms=window, batch_max=args.batch_max))
        # Warm the compiled programs outside the timed region: one
        # single-request solve (window=0 path) or one padded batch.
        service._solve_scrambled(
            np.zeros((args.image_size, args.image_size, 3), np.float32),
            args.mode)
        print(json.dumps(run_config(service, args.clients, args.mode)),
              flush=True)


if __name__ == "__main__":
    main()
