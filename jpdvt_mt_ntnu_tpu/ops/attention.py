"""Fused multi-head self-attention for the DiT.

The reference relies on timm's ``Attention`` (SDPA -> FlashAttention CUDA on
torch>=2.0, reference: image_model/models.py:16,108). The TPU-native answer is
a Pallas kernel that keeps the whole (N x N) score matrix in VMEM — JPDVT
sequences are tiny (144 tokens @192px, 324 @288px, 16 for JPDVT-T;
SURVEY.md §5.7), so one fused kernel per (batch, head) with fp32 softmax is
the speed-of-light shape: a single HBM round-trip for q/k/v/o and all matmuls
on the MXU. An XLA einsum fallback covers CPU tests and acts as the
correctness oracle.

Semantics match timm: scale = head_dim**-0.5 applied to q, no masking,
no dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # MXU operands stay in the INPUT dtype (bf16 in production) with fp32
    # accumulation — casting to fp32 first would force the ~8x-slower fp32
    # MXU path on v5e. Softmax statistics are fp32. This mirrors
    # _attention_xla exactly.
    q = q_ref[0, 0] * scale
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """Fused backward: recompute softmax (flash-style) then dq/dk/dv.

    MXU dot operands stay in the input dtype (fp32 softmax stats /
    accumulation) — matching what XLA autodiff of the einsum oracle does
    for bf16 models, at full bf16 MXU speed.
    """
    q = q_ref[0, 0] * scale
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)              # (N, N) fp32
    pc = p.astype(v.dtype)
    dv = jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (N, N) fp32
    dsc = ds.astype(q.dtype)
    dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(dsc.T, q, preferred_element_type=jnp.float32)  # q already scaled
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bhspec(n, d):
    return pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas_fwd_only(q, k, v, interpret: bool = False):
    b, h, n, d = q.shape
    scale = d ** -0.5
    spec = _bhspec(n, d)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (2 * n * n * d),
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas_bwd(q, k, v, do, interpret: bool = False):
    b, h, n, d = q.shape
    scale = d ** -0.5
    spec = _bhspec(n, d)
    shapes = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        out_shape=(shapes, shapes, shapes),
        grid=(b, h),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (5 * n * n * d),
            bytes_accessed=7 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_pallas(q, k, v, interpret: bool = False):
    """Differentiable fused attention: Pallas forward + Pallas backward."""
    return _attention_pallas_fwd_only(q, k, v, interpret)


def _attention_pallas_fwd_rule(q, k, v, interpret):
    return _attention_pallas_fwd_only(q, k, v, interpret), (q, k, v)


def _attention_pallas_bwd_rule(interpret, res, do):
    q, k, v = res
    dq, dk, dv = _attention_pallas_bwd(q, k, v, do, interpret)
    return dq, dk, dv


_attention_pallas.defvjp(_attention_pallas_fwd_rule, _attention_pallas_bwd_rule)


def _attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation: plain einsums, fp32 softmax."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def default_impl(n_tokens: int | None = None) -> str:
    """Pick the attention impl by measurement, not ideology.

    TPU v5e, tools/bench_attention.py (chained-scan wall clock, H=12 D=64,
    bf16, round 2, after the native-dtype MXU fix):

    - N<=324 (the JPDVT 192/288px geometries): XLA's batched MXU einsums
      win — per-(batch, head-group) kernel launches can't amortize at
      these sizes (fwd+bwd N=324: XLA 482us vs pallas 735us).
    - N in [512, 1296]: the whole-row Pallas kernels win, decisively on
      fwd+bwd (N=1024: 1.25 ms vs XLA 4.69 ms; N=1296: 1.15 vs 3.74) —
      one VMEM round trip and a fused recompute backward beat XLA's
      materialized softmax.
    - N > 1296: whole-row blocks exceed VMEM; the flash-tiled kernels
      (ops/flash_attention.py, 512x1024 tiles) win BOTH modes
      (fwd+bwd N=2048: 3.20 ms vs XLA 8.95; N=4096: 5.91 vs 24.5 — 4.1x).

    `n_tokens=None` (unknown geometry) and non-TPU backends choose XLA.
    """
    if n_tokens is None or jax.default_backend() != "tpu":
        return "xla"
    if 512 <= n_tokens <= 1296:
        return "pallas"
    if n_tokens > 1296:
        return "flash"
    return "xla"


# ---------------------------------------------------------------------------
# Fused-qkv attention: no head transposes.
#
# The (B, N, 3, H, Dh) -> (B, H, N, Dh) reshuffle around a conventional
# attention call costs more than the attention math itself at JPDVT's sizes
# (measured: ~38% of a solve step for ~3% of FLOPs). These kernels read the
# head slices DIRECTLY out of the fused qkv projection output
# (B, N, 3*H*Dh; feature layout [q|k|v][head][dim], the timm/torch layout)
# via BlockSpec column indexing, and write the output back in (B, N, H*Dh)
# layout — zero layout-change ops in XLA.
# ---------------------------------------------------------------------------


def _heads_per_block(d: int) -> int:
    """Heads packed per program so the block's lane dim is 128-aligned
    (Mosaic requires last-dim blocks divisible by 128 or full-size)."""
    if 128 % d == 0:
        return 128 // d
    return 1  # requires d % 128 == 0 (checked by caller)


def _qkv_attn_kernel(qkv_ref, o_ref, *, scale: float, d: int, hpb: int,
                     bb: int = 1):
    for b in range(bb):
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            q = qkv_ref[b, :, 0, sl] * scale  # input dtype on the MXU,
            k = qkv_ref[b, :, 1, sl]          # fp32 accumulation below
            v = qkv_ref[b, :, 2, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[b, :, sl] = o.astype(o_ref.dtype)


def _qkv_attn_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale: float,
                         d: int, hpb: int, bb: int = 1):
    for b in range(bb):
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            q = qkv_ref[b, :, 0, sl] * scale  # input dtype on the MXU,
            k = qkv_ref[b, :, 1, sl]          # fp32 softmax/accumulation
            v = qkv_ref[b, :, 2, sl]
            do = do_ref[b, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pc = p.astype(v.dtype)
            dv = jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsc = ds.astype(q.dtype)
            dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
            dk = jnp.dot(dsc.T, q, preferred_element_type=jnp.float32)
            dqkv_ref[b, :, 0, sl] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, 1, sl] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, 2, sl] = dv.astype(dqkv_ref.dtype)


def _qkv_geometry(f: int, num_heads: int):
    """-> (head_dim, heads_per_block) or (head_dim, None) if the layout
    cannot form a Mosaic-legal block (callers fall back to XLA)."""
    d = f // (3 * num_heads)
    hpb = min(_heads_per_block(d), num_heads)
    while hpb > 1 and num_heads % hpb:
        hpb -= 1
    w = d * hpb
    if w % 128 and w != num_heads * d:
        return d, None
    return d, hpb


def _qkv_specs(n: int, d: int, hpb: int, bb: int):
    w = d * hpb
    qkv_spec = pl.BlockSpec((bb, n, 3, w), lambda b, g: (b, 0, 0, g),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bb, n, w), lambda b, g: (b, 0, g),
                          memory_space=pltpu.VMEM)
    return qkv_spec, o_spec


def _batch_block(b: int, n: int, bb: int | None) -> int:
    """Batch items packed per program. At JPDVT's tiny sequence lengths the
    per-program launch overhead dominates one head-pair of MXU work, so
    multiple batch items share a program. ``None`` auto-picks the largest
    block that divides the batch (tuned by tools/bench_attention.py); VMEM
    caps the block for long sequences (n > 512 -> whole-row blocks already
    fill VMEM)."""
    if bb is None:
        bb = 8 if n <= 384 else (2 if n <= 768 else 1)
    while b % bb:
        bb //= 2
    return max(bb, 1)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "bb"))
def _fused_qkv_attention_fwd(qkv, num_heads, interpret=False, bb=None):
    b, n, f = qkv.shape
    d, hpb = _qkv_geometry(f, num_heads)
    bb = _batch_block(b, n, bb)
    scale = d ** -0.5
    qkv4 = qkv.reshape(b, n, 3, num_heads * d)
    qkv_spec, o_spec = _qkv_specs(n, d, hpb, bb)
    return pl.pallas_call(
        functools.partial(_qkv_attn_kernel, scale=scale, d=d, hpb=hpb, bb=bb),
        out_shape=jax.ShapeDtypeStruct((b, n, num_heads * d), qkv.dtype),
        grid=(b // bb, num_heads // hpb),
        in_specs=[qkv_spec],
        out_specs=o_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_heads * (2 * n * n * d),
            bytes_accessed=4 * b * n * f * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(qkv4)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "bb"))
def _fused_qkv_attention_bwd_impl(qkv, do, num_heads, interpret=False,
                                  bb=None):
    b, n, f = qkv.shape
    d, hpb = _qkv_geometry(f, num_heads)
    bb = _batch_block(b, n, bb)
    scale = d ** -0.5
    qkv4 = qkv.reshape(b, n, 3, num_heads * d)
    qkv_spec, o_spec = _qkv_specs(n, d, hpb, bb)
    dqkv = pl.pallas_call(
        functools.partial(_qkv_attn_bwd_kernel, scale=scale, d=d, hpb=hpb,
                          bb=bb),
        out_shape=jax.ShapeDtypeStruct((b, n, 3, num_heads * d), qkv.dtype),
        grid=(b // bb, num_heads // hpb),
        in_specs=[qkv_spec, o_spec],
        out_specs=qkv_spec,
        interpret=interpret,
    )(qkv4, do)
    return dqkv.reshape(b, n, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_qkv_attention_pallas(qkv, num_heads: int, interpret: bool = False,
                                bb: int | None = None):
    return _fused_qkv_attention_fwd(qkv, num_heads, interpret, bb)


def fused_qkv_attention(qkv, num_heads: int, interpret: bool = False,
                        bb: int | None = None):
    """Attention straight from the fused qkv projection.

    qkv: (B, N, 3*H*Dh) in [q|k|v][head][dim] feature order ->
    (B, N, H*Dh). Pallas when the head layout forms Mosaic-legal blocks,
    transparent XLA fallback otherwise. ``bb`` packs several batch items
    per program (None = measured auto, see _batch_block).
    """
    _, hpb = _qkv_geometry(qkv.shape[-1], num_heads)
    if hpb is None:
        return fused_qkv_attention_xla(qkv, num_heads)
    return _fused_qkv_attention_pallas(qkv, num_heads, interpret, bb)


def _fqa_fwd(qkv, num_heads, interpret, bb):
    return _fused_qkv_attention_fwd(qkv, num_heads, interpret, bb), qkv


def _fqa_bwd(num_heads, interpret, bb, qkv, do):
    return (_fused_qkv_attention_bwd_impl(qkv, do, num_heads, interpret, bb),)


_fused_qkv_attention_pallas.defvjp(_fqa_fwd, _fqa_bwd)


def fused_qkv_attention_xla(qkv, num_heads: int):
    """Reference implementation of fused_qkv_attention in plain XLA."""
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    q, k, v = (a.reshape(b, n, num_heads, d)
               for a in jnp.split(qkv, 3, axis=-1))
    q = jnp.moveaxis(q, 2, 1)
    k = jnp.moveaxis(k, 2, 1)
    v = jnp.moveaxis(v, 2, 1)
    o = _attention_xla(q, k, v)
    return jnp.moveaxis(o, 1, 2).reshape(b, n, num_heads * d)


def multihead_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        impl: str | None = None) -> jnp.ndarray:
    """Fused MHA. q, k, v: (B, H, N, Dh) -> (B, H, N, Dh).

    impl: "pallas" | "xla" | "flash" | "interpret" | None (auto by
    backend + measured per-geometry rules, see default_impl).
    """
    impl = impl or default_impl(q.shape[2])
    if impl == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    if impl == "pallas":
        return _attention_pallas(q, k, v)
    if impl == "interpret":
        return _attention_pallas(q, k, v, True)
    if impl == "xla":
        return _attention_xla(q, k, v)
    raise ValueError(f"unknown attention impl: {impl}")
