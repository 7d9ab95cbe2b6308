"""On-device attention implementation shootout: XLA vs whole-row Pallas
vs flash-tiled Pallas.

Times each impl at the JPDVT model geometries (144/324 tokens, head_dim
64) and at long sequences where the whole-row kernels exceed their VMEM
cap (~1.3k tokens) and only flash tiling can run. Methodology follows the
axon-tunnel rules (PERF.md): one jitted program containing a lax.scan of
ITERS chained applications (output feeds back as q, so nothing is DCE'd),
timed over whole-program wall clock with a single final sync.

Usage (needs the real TPU; keep it the only TPU process):
    python tools/bench_attention.py [--fwd-only] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jpdvt_mt_ntnu_tpu.ops.attention import (_attention_pallas,
                                              _attention_xla,
                                              fused_attention_block,
                                              fused_attention_block_xla,
                                              fused_qkv_attention,
                                              fused_qkv_attention_xla)
from jpdvt_mt_ntnu_tpu.ops.flash_attention import flash_attention

ITERS = 50          # scan length inside one program
REPEATS = 4         # timed program replays (first replay after compile)

# (B, H, N, D): model geometries, then long-sequence scaling at constant
# B*N (so total work grows ~linearly with N and fits HBM).
CASES = [
    (32, 12, 144, 64),    # flagship 192px solve batch
    (16, 12, 324, 64),    # 288px geometry
    (16, 12, 512, 64),
    (8, 12, 1024, 64),
    (4, 12, 1296, 64),    # 576px geometry; routing-window upper edge

    (4, 12, 2048, 64),    # past the whole-row VMEM cap
    (2, 12, 4096, 64),
]

IMPLS = {
    "xla": _attention_xla,
    "pallas": lambda q, k, v: _attention_pallas(q, k, v),
    "flash": lambda q, k, v: flash_attention(q, k, v),
}

# Sublayer-level impls: the WHOLE attention sublayer (qkv projection +
# MHA + output projection) on the model's real (B, N, D) activations —
# what dit.py Attention actually computes. "sub_xla" is XLA's fused chain;
# "blk_bbK" is the single-program Pallas block with K batch items packed
# per program (ops/attention.fused_attention_block).
def _sub_weights(h, d, hidden, dtype):
    k = jax.random.split(jax.random.key(9), 4)
    return (jax.random.normal(k[0], (3 * h, hidden, d), dtype) * 0.05,
            jax.random.normal(k[1], (3 * h, 1, d), jnp.float32) * 0.05,
            jax.random.normal(k[2], (h, d, hidden), dtype) * 0.05,
            jax.random.normal(k[3], (1, hidden), jnp.float32) * 0.05)


SUB_IMPLS = {
    "sub_xla": lambda x, w, h: fused_attention_block_xla(x, *w, h),
    "blk_bb1": lambda x, w, h: fused_attention_block(x, *w, h, False, 1),
    "blk_bb2": lambda x, w, h: fused_attention_block(x, *w, h, False, 2),
    "blk_bb4": lambda x, w, h: fused_attention_block(x, *w, h, False, 4),
    "blk_bb8": lambda x, w, h: fused_attention_block(x, *w, h, False, 8),
}

# Row-route check: (B,N,3F) -> transposes + whole-row Pallas kernels.
QKV_IMPLS = {
    "fq_xla": lambda qkv, h: fused_qkv_attention_xla(qkv, h),
    "fq_row": lambda qkv, h: fused_qkv_attention(qkv, h),
}


def _loop(fn, grad: bool):
    """One jitted program: scan ITERS chained attention applications."""
    if grad:
        def step(q, _):
            def loss(q_):
                return jnp.sum(fn(q_, q_, q_) ** 2)
            g = jax.grad(loss)(q)
            return q - 1e-6 * g, ()
    else:
        def step(q, _):
            return fn(q, q, q), ()

    def run(q):
        out, _ = jax.lax.scan(step, q, None, length=ITERS)
        return out

    return jax.jit(run)


def bench_case(b, h, n, d, impl_name, grad):
    fn = IMPLS[impl_name]
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
    try:
        prog = _loop(fn, grad)
        # On the axon remote backend block_until_ready returns before the
        # program finishes; only a D2H materialization is a real sync.
        # So: warm up, then time REPEATS chained programs ending in one
        # scalar fetch.
        float(jnp.sum(prog(q)))  # compile + first run + sync
        t0 = time.perf_counter()
        out = q
        for _ in range(REPEATS):
            out = prog(out)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / (REPEATS * ITERS)
        return dt * 1e6  # us per attention application
    except Exception as e:  # noqa: BLE001 — record OOM/lowering failures
        msg = type(e).__name__
        if "RESOURCE_EXHAUSTED" in str(e) or "exceeds" in str(e):
            msg = "VMEM-OOM"
        return msg


def _loop_qkv(fn, h, grad):
    """Chained scan over the fused-qkv layout: o is tiled back to 3F so the
    value feeds forward and nothing is DCE'd."""
    if grad:
        def step(qkv, _):
            def loss(x):
                return jnp.sum(fn(x, h) ** 2)
            g = jax.grad(loss)(qkv)
            return qkv - 1e-6 * g, ()
    else:
        def step(qkv, _):
            o = fn(qkv, h)
            return jnp.concatenate([o, o, o], -1), ()

    def run(qkv):
        out, _ = jax.lax.scan(step, qkv, None, length=ITERS)
        return out

    return jax.jit(run)


def bench_case_qkv(b, h, n, d, impl_name, grad):
    fn = QKV_IMPLS[impl_name]
    qkv = jax.random.normal(jax.random.key(0), (b, n, 3 * h * d),
                            jnp.bfloat16)
    try:
        prog = _loop_qkv(fn, h, grad)
        float(jnp.sum(prog(qkv)))
        t0 = time.perf_counter()
        out = qkv
        for _ in range(REPEATS):
            out = prog(out)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / (REPEATS * ITERS) * 1e6
    except Exception as e:  # noqa: BLE001
        msg = type(e).__name__
        if "RESOURCE_EXHAUSTED" in str(e) or "exceeds" in str(e):
            msg = "VMEM-OOM"
        return msg


def bench_case_sub(b, h, n, d, impl_name, grad):
    """Whole attention-sublayer chain on (B, N, D) activations."""
    fn = SUB_IMPLS[impl_name]
    hidden = h * d
    x = jax.random.normal(jax.random.key(0), (b, n, hidden), jnp.bfloat16)
    w = _sub_weights(h, d, hidden, jnp.bfloat16)
    if grad:
        def step(x_, _):
            def loss(z):
                return jnp.sum(fn(z, w, h) ** 2)
            return x_ - 1e-6 * jax.grad(loss)(x_), ()
    else:
        def step(x_, _):
            return fn(x_, w, h), ()

    def run(x_):
        out, _ = jax.lax.scan(step, x_, None, length=ITERS)
        return out

    try:
        prog = jax.jit(run)
        float(jnp.sum(prog(x)))
        t0 = time.perf_counter()
        out = x
        for _ in range(REPEATS):
            out = prog(out)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / (REPEATS * ITERS) * 1e6
    except Exception as e:  # noqa: BLE001
        msg = type(e).__name__
        if "RESOURCE_EXHAUSTED" in str(e) or "exceeds" in str(e):
            msg = "VMEM-OOM"
        return msg


def check_correctness(cases=CASES):
    """Hardware validation vs the XLA oracles at every geometry, incl. the
    512-1296 routing window: the row route (transposes + whole-row Pallas,
    fwd AND fused bwd) and the attention-block kernel (fwd; its bwd IS the
    XLA reference by construction)."""
    for b, h, n, d in cases:
        qkv = jax.random.normal(jax.random.key(1), (b, n, 3 * h * d),
                                jnp.bfloat16)
        ref_f = fused_qkv_attention_xla(qkv, h)
        g_ref = jax.grad(lambda x: jnp.sum(
            fused_qkv_attention_xla(x, h) ** 2))(qkv)
        try:
            df = float(jnp.max(jnp.abs(
                (fused_qkv_attention(qkv, h) - ref_f).astype(jnp.float32))))
            g = jax.grad(lambda x: jnp.sum(
                fused_qkv_attention(x, h) ** 2))(qkv)
            dg = float(jnp.max(jnp.abs((g - g_ref).astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32))))
            ok = df < 0.1 and dg < 0.02 * max(scale, 1)
            print(f"check N={n:5d} fq_row: fwd_maxdiff={df:.4f} "
                  f"bwd_maxdiff={dg:.4f} (bwd_scale={scale:.1f}) "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"check N={n:5d} fq_row: {type(e).__name__}", flush=True)

        hidden = h * d
        x = jax.random.normal(jax.random.key(2), (b, n, hidden),
                              jnp.bfloat16)
        w = _sub_weights(h, d, hidden, jnp.bfloat16)
        ref_b = fused_attention_block_xla(x, *w, h)
        sc = float(jnp.max(jnp.abs(ref_b.astype(jnp.float32))))
        for bb in (1, 2, 4, 8):
            if b % bb:
                continue
            try:
                out = fused_attention_block(x, *w, h, False, bb)
                db = float(jnp.max(jnp.abs((out - ref_b).astype(jnp.float32))))
                ok = db < 0.05 * max(sc, 1)
                print(f"check N={n:5d} blk_bb{bb}: fwd_maxdiff={db:.4f} "
                      f"(scale={sc:.2f}) {'OK' if ok else 'MISMATCH'}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"check N={n:5d} blk_bb{bb}: {type(e).__name__}",
                      flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--check", action="store_true",
                    help="validate fused-qkv kernels vs the XLA oracle")
    ap.add_argument("--qkv-only", action="store_true")
    ap.add_argument("--cases", default=None,
                    help="comma-separated N filter, e.g. 144,324,512")
    args = ap.parse_args()

    from jpdvt_mt_ntnu_tpu.utils.platform import init_compilation_cache

    init_compilation_cache()
    global CASES
    if args.cases:
        keep = {int(s) for s in args.cases.split(",")}
        CASES = [c for c in CASES if c[2] in keep]
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    if args.check:
        check_correctness()
        return
    rows = []
    for grad in ([False] if args.fwd_only else [False, True]):
        tag = "fwd+bwd" if grad else "fwd"
        for b, h, n, d in CASES:
            line = [f"{tag} B={b} H={h} N={n} D={d}:"]
            if not args.qkv_only:
                for name in IMPLS:
                    r = bench_case(b, h, n, d, name, grad)
                    val = f"{r:9.1f}us" if isinstance(r, float) else f"{r:>11}"
                    line.append(f"{name}={val}")
                    rows.append((tag, b, h, n, d, name, r))
                for name in QKV_IMPLS:
                    r = bench_case_qkv(b, h, n, d, name, grad)
                    val = f"{r:9.1f}us" if isinstance(r, float) else f"{r:>11}"
                    line.append(f"{name}={val}")
                    rows.append((tag, b, h, n, d, name, r))
            for name in SUB_IMPLS:
                r = bench_case_sub(b, h, n, d, name, grad)
                val = f"{r:9.1f}us" if isinstance(r, float) else f"{r:>11}"
                line.append(f"{name}={val}")
                rows.append((tag, b, h, n, d, name, r))
            print("  ".join(line), flush=True)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("mode,b,h,n,d,impl,us_per_call\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")


if __name__ == "__main__":
    main()
