"""MicroBatcher load test (round 3): N concurrent clients, open window.

Asserts under real thread concurrency that
- every request completes (no starvation) and gets ITS OWN result back
  (routing correctness under batching),
- requests actually coalesce into shared device programs,
- wall-clock and p99 latency beat the one-program-per-request baseline by
  roughly the batching factor.

The solve_fn is a deterministic stand-in with a fixed per-program cost so
the queueing behavior is measured, not the model (real-chip serving
numbers live in PERF.md).
"""

import threading
import time

import numpy as np

from jpdvt_mt_ntnu_tpu.serve.plugins import MicroBatcher

N_CLIENTS = 48
MAX_BATCH = 8
PROGRAM_COST_S = 0.03  # pretend one padded device program costs 30 ms


def _make_batcher():
    calls = []

    def solve_fn(xs):
        # One fixed-shape "device program": constant cost per CALL, not per
        # item — the property micro-batching exploits.
        time.sleep(PROGRAM_COST_S)
        calls.append(xs.shape[0])
        # Route each row back by the id embedded in its pixels.
        ids = xs[:, 0, 0, 0].astype(np.int64)
        return np.stack([np.full(9, i) for i in ids])

    return MicroBatcher(solve_fn, max_batch=MAX_BATCH, window_ms=5.0), calls


def test_concurrent_clients_no_starvation_and_correct_routing():
    batcher, _ = _make_batcher()
    latencies = np.zeros(N_CLIENTS)
    errors = []
    barrier = threading.Barrier(N_CLIENTS)

    def client(i):
        img = np.full((6, 6, 3), float(i), np.float32)
        barrier.wait()
        t0 = time.perf_counter()
        try:
            pred = batcher.solve(img, timeout=30.0)
            latencies[i] = time.perf_counter() - t0
            if not (pred == i).all():
                errors.append(f"client {i} got {pred[0]}")
        except Exception as e:
            errors.append(f"client {i}: {e!r}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    wall = time.perf_counter() - t0
    batcher.shutdown()

    assert not errors, errors[:5]
    assert (latencies > 0).all(), "some client never completed (starved)"

    # Coalescing happened: far fewer programs than clients.
    assert batcher.items_run >= N_CLIENTS
    assert batcher.batches_run <= N_CLIENTS // 2, \
        f"{batcher.batches_run} programs for {batcher.items_run} items " \
        "— requests are not coalescing"

    serial_wall = N_CLIENTS * PROGRAM_COST_S  # one-program-per-request
    p50, p99 = np.percentile(latencies, [50, 99])
    print(f"\nload test: {N_CLIENTS} clients, max_batch={MAX_BATCH}: "
          f"wall={wall*1e3:.0f}ms (serial would be {serial_wall*1e3:.0f}ms), "
          f"p50={p50*1e3:.0f}ms p99={p99*1e3:.0f}ms, "
          f"{batcher.batches_run} programs for {batcher.items_run} items")
    # Batched wall-clock must clearly beat serial; p99 must stay far below
    # the serial tail (a starved client would sit at ~serial_wall). The
    # 0.7 margin leaves headroom for scheduler pauses on the 1-core CI VM
    # (typical measured wall is ~0.15x serial; a full-suite run once
    # crossed 0.6x) while still failing hard on any real starvation.
    assert wall < serial_wall * 0.7, \
        f"wall {wall*1e3:.0f}ms vs serial {serial_wall*1e3:.0f}ms " \
        f"({batcher.batches_run} programs, p50 {p50*1e3:.0f}ms p99 {p99*1e3:.0f}ms)"
    assert p99 < serial_wall * 0.7, \
        f"p99 {p99*1e3:.0f}ms vs serial {serial_wall*1e3:.0f}ms " \
        f"({batcher.batches_run} programs for {batcher.items_run} items)"


def test_queue_drains_after_burst_then_idle():
    """A second burst after an idle period reuses the worker cleanly."""
    batcher, calls = _make_batcher()
    for burst in range(2):
        threads = []
        results = {}

        def client(i):
            img = np.full((6, 6, 3), float(i), np.float32)
            results[i] = batcher.solve(img, timeout=30.0)

        for i in range(10):
            t = threading.Thread(target=client, args=(i,))
            t.start()
            threads.append(t)
        for t in threads:
            t.join(30)
        assert len(results) == 10
        for i, pred in results.items():
            assert (pred == i).all()
        time.sleep(0.3)  # idle the worker between bursts
    batcher.shutdown()
    assert sum(calls) >= 20
