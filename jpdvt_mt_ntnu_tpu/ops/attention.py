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
    """Reference implementation: plain einsums, fp32 softmax.

    Deliberately left to PLAIN AUTODIFF. Two structural backward attacks
    on the training path were built and measured SLOWER on hardware than
    what XLA's autodiff + scheduler emit for this (flagship train step,
    batch 96, tools/bench_train.py; baseline 83.1 ms/step):

    - jax.checkpoint around the attention core (flash-style recompute of
      the (N,N) probs in backward): 88.8 ms/step;
    - a custom VJP computing dV/dP/dQ/dK with input-dtype (bf16) dot
      operands and fp32 softmax-gradient math (the Pallas kernels'
      convention, to keep the NxN cotangents off the fp32 MXU path):
      86.4 ms/step.

    XLA already overlaps the probs-residual round trips with neighboring
    weight-gradient matmuls (the train profile shows the attention-core
    fusions running at ~600 GB/s — bandwidth roofline), and hand-written
    VJPs only break its fusion choices. See PERF.md "train-step device
    profile".
    """
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def default_impl(n_tokens: int | None = None) -> str:
    """Pick the attention impl by measurement, not ideology.

    TPU v5e, tools/bench_attention.py (chained-scan wall clock, H=12 D=64,
    bf16; round-3 numbers, measured AFTER the Mosaic lowering fix — the
    round-2 fused-qkv kernels never actually compiled on hardware):

    - N<=324 (the JPDVT 192/288px geometries): XLA wins, with receipts.
      Whole-SUBLAYER comparison at N=144 B=32 fwd: XLA fused chain 380us
      vs the zero-HBM-intermediate fused_attention_block 549us (N=324:
      383 vs 557) — Mosaic's layout rules (128-aligned lane slices, no
      middle-dim collapses) force head_dim-64 projections onto half-width
      MXU tiles, and three kernel families (per-head whole-row, packed
      fused-qkv, fused block) all measured slower than XLA's fused
      einsums here. Attention-op-only: XLA 228/264us vs pallas 381/370.
    - N in [512, 1296]: the whole-row Pallas route wins: model-layout
      fq_row (transposes + whole-row kernels) 438us vs fq_xla 582us at
      N=512 fwd; raw-layout pallas 378 vs XLA 490 (and round-2's decisive
      fwd+bwd wins at 1024/1296 were measured on these same validated
      whole-row kernels).
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
# Fused-qkv attention (row-kernel route) and the fused attention BLOCK.
#
# Hardware lesson (round 3): Mosaic cannot collapse MIDDLE unit dims of a
# block (e.g. (bb, n, 1, d) -> (n, d) is an "unsupported shape cast"), and
# lane slices must be 128-aligned — so attention kernels that read head
# slices directly out of a (B, N, features) layout can NEVER lower on TPU,
# no matter how the heads are packed (the round-2 fused-qkv kernels only
# ever ran in interpret mode). Two designs that DO lower:
#
# 1. fused_qkv_attention: (B,N,3F) -> (B,H,N,Dh) transposes around the
#    validated whole-row kernels (_attention_pallas). The transposes cost
#    HBM traffic; measured per-geometry in tools/bench_attention.py.
# 2. fused_attention_block: the ENTIRE attention sublayer (qkv projection
#    + per-head attention + output projection) as ONE kernel. Weights are
#    pre-laid out as (3H, D, d)/(H, d, D) so every in-kernel head slice is
#    a LEADING-dim collapse (legal for any head_dim), and no score matrix,
#    qkv tensor, or per-head output ever touches HBM — the design target
#    for JPDVT's tiny sequences where XLA is bandwidth-bound on exactly
#    those intermediates.
# ---------------------------------------------------------------------------


def fused_qkv_attention(qkv, num_heads: int, interpret: bool = False,
                        bb: int | None = None):
    """Attention from the fused qkv projection output.

    qkv: (B, N, 3*H*Dh) in [q|k|v][head][dim] feature order ->
    (B, N, H*Dh), via explicit head transposes + the whole-row Pallas
    kernels (fwd + fused bwd). ``bb`` is accepted for API compatibility
    and ignored (batch packing lives in fused_attention_block)."""
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    q, k, v = (jnp.moveaxis(a.reshape(b, n, num_heads, d), 2, 1)
               for a in jnp.split(qkv, 3, axis=-1))
    o = _attention_pallas(q, k, v, interpret)
    return jnp.moveaxis(o, 1, 2).reshape(b, n, num_heads * d)


def _attn_block_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                       o_ref, *, scale: float, heads: int, bb: int):
    """One program = ``bb`` batch items through the full attention
    sublayer. x_ref: (bb, n, D); wqkv_ref: (3H, D, d) (q rows 0..H-1, k
    rows H..2H-1, v rows 2H..3H-1); bqkv_ref: (3H, 1, d); wproj_ref:
    (H, d, D); bproj_ref: (1, D); o_ref: (bb, n, D)."""
    for b in range(bb):
        x = x_ref[b]                                     # (n, D)
        acc = jnp.zeros(o_ref.shape[1:], jnp.float32)    # (n, D)
        for h in range(heads):
            def proj(j):
                y = jnp.dot(x, wqkv_ref[j],
                            preferred_element_type=jnp.float32)
                return (y + bqkv_ref[j]).astype(x.dtype)  # (n, d)
            q = proj(h) * scale
            k = proj(heads + h)
            v = proj(2 * heads + h)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (n, n) fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(o.astype(x.dtype), wproj_ref[h],
                                preferred_element_type=jnp.float32)
        o_ref[b] = (acc + bproj_ref[...]).astype(o_ref.dtype)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom of the ~16 MB per core


def _block_vmem(bb, n, heads, d, hidden, itemsize) -> int:
    weights = (3 * heads * hidden * d + heads * d * hidden) * itemsize
    blocks = 2 * bb * n * hidden * itemsize        # x + out
    work = n * hidden * 4 + 3 * n * n * 4          # fp32 acc + score temps
    return weights + blocks + work


def _block_bb(b: int, n: int, heads: int, d: int, hidden: int,
              itemsize: int, bb: int | None) -> int | None:
    """Batch items per program: amortize launch overhead under a VMEM
    budget (weights are grid-invariant, fetched once)."""
    if bb is None:
        bb = 8 if n <= 160 else (4 if n <= 384 else 1)
    while b % bb:
        bb //= 2
    bb = max(bb, 1)
    while bb > 1 and _block_vmem(bb, n, heads, d, hidden, itemsize) > _VMEM_BUDGET:
        bb //= 2
    if _block_vmem(bb, n, heads, d, hidden, itemsize) > _VMEM_BUDGET:
        return None
    return bb


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "bb"))
def _fused_attention_block_fwd(x, w_qkv, b_qkv, w_proj, b_proj, num_heads,
                               interpret=False, bb=None):
    b, n, hidden = x.shape
    d = w_qkv.shape[-1]
    bb = _block_bb(b, n, num_heads, d, hidden, x.dtype.itemsize, bb)
    if bb is None:
        return fused_attention_block_xla(x, w_qkv, b_qkv, w_proj, b_proj,
                                         num_heads)
    scale = d ** -0.5
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — grid-invariant block
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((bb, n, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, scale=scale, heads=num_heads,
                          bb=bb),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // bb,),
        in_specs=[xspec, full(w_qkv.shape), full(b_qkv.shape),
                  full(w_proj.shape), full(b_proj.shape)],
        out_specs=xspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * hidden * (4 * num_heads * d)
            + 4 * b * num_heads * n * n * d,
            bytes_accessed=2 * b * n * hidden * x.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
    )(x, w_qkv, b_qkv, w_proj, b_proj)


def fused_attention_block_xla(x, w_qkv, b_qkv, w_proj, b_proj,
                              num_heads: int):
    """Reference implementation of the fused block in plain XLA ops,
    numerically matching the kernel (bf16 operands, fp32 softmax)."""
    q, k, v = (jnp.einsum("bnd,hdk->bhnk", x,
                          w_qkv[i * num_heads:(i + 1) * num_heads])
               + b_qkv[i * num_heads:(i + 1) * num_heads][None, :, 0, None, :]
               for i in range(3))
    o = _attention_xla(q.astype(x.dtype), k.astype(x.dtype),
                       v.astype(x.dtype))
    out = jnp.einsum("bhnk,hkd->bnd", o.astype(x.dtype), w_proj)
    return (out + b_proj[0]).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention_block(x, w_qkv, b_qkv, w_proj, b_proj, num_heads: int,
                          interpret: bool = False, bb: int | None = None):
    """The whole attention sublayer (qkv proj + MHA + out proj) as one
    Pallas program per ``bb`` batch items — zero HBM intermediates.

    x: (B, N, D); w_qkv: (3H, D, Dh) with q rows 0..H-1, k rows H..2H-1,
    v rows 2H..3H-1; b_qkv: (3H, 1, Dh); w_proj: (H, Dh, D); b_proj:
    (1, D). Backward differentiates the XLA reference (the block is
    inference-critical; training-path geometry routes are measured
    separately)."""
    return _fused_attention_block_fwd(x, w_qkv, b_qkv, w_proj, b_proj,
                                      num_heads, interpret, bb)


def _fab_fwd(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, interpret, bb):
    out = _fused_attention_block_fwd(x, w_qkv, b_qkv, w_proj, b_proj,
                                     num_heads, interpret, bb)
    return out, (x, w_qkv, b_qkv, w_proj, b_proj)


def _fab_bwd(num_heads, interpret, bb, res, g):
    x, w_qkv, b_qkv, w_proj, b_proj = res
    _, vjp = jax.vjp(
        lambda *a: fused_attention_block_xla(*a, num_heads), x, w_qkv,
        b_qkv, w_proj, b_proj)
    return vjp(g)


fused_attention_block.defvjp(_fab_fwd, _fab_bwd)


def dense_to_block_weights(qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                           num_heads: int):
    """(D, 3F) timm-order Dense params -> the block kernel layouts."""
    hidden = qkv_kernel.shape[0]
    d = qkv_kernel.shape[1] // (3 * num_heads)
    w_qkv = qkv_kernel.reshape(hidden, 3 * num_heads, d).transpose(1, 0, 2)
    b_qkv = qkv_bias.reshape(3 * num_heads, 1, d)
    w_proj = proj_kernel.reshape(num_heads, d, hidden)
    b_proj = proj_bias.reshape(1, hidden)
    return w_qkv, b_qkv, w_proj, b_proj


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


def fused_qkv_attention_xla2(qkv, num_heads: int):
    """Layout-free XLA attention: einsums straight off the (B, N, 3HD) qkv.

    Identical math to :func:`fused_qkv_attention_xla`, but with NO explicit
    ``moveaxis``/``split`` — heads stay where the projection wrote them and
    every reorder is implicit in the einsum subscripts. Why this exists: a
    device profile of the faithful solve (round 3) showed the explicit
    transposes materializing as 3 layout copies of (B, N, hidden) per block
    (~46 us/block, 10% of the whole step at B=32/N=144); phrasing the
    contractions without transposes lets XLA's layout assignment propagate
    the attention-friendly layout back into the projection output instead
    of copying.
    """
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    qkv5 = qkv.reshape(b, n, 3, num_heads, d)
    q = qkv5[:, :, 0] * (d ** -0.5)
    k = qkv5[:, :, 1]
    v = qkv5[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    return o.reshape(b, n, num_heads * d)


def split_qkv_attention_xla(x, qkv_k, qkv_b, num_heads: int):
    """Attention with per-head split projections: q/k/v each projected by
    its own einsum emitting (B, H, N, D) straight from the dot.

    Motivation (round-3 device profile): the fused-qkv path pays 3 layout
    copies of (B, N, hidden) per block (~46 us at B=32/N=144) flipping the
    projection's feature-in-lanes output into the feature-in-sublanes
    layout the scores/AV dots consume. Splitting the projection lets each
    conv write its operand layout directly; the extra cost is 3 smaller
    dots instead of 1 large one. Weight/bias layout is unchanged
    (the fused (F, 3F) kernel is sliced here), so checkpoints are
    interchangeable across impls.
    """
    b, n, f = x.shape
    d = f // num_heads
    w = qkv_k.reshape(f, 3, num_heads, d)
    bias = qkv_b.reshape(3, num_heads, d).astype(x.dtype)
    proj = lambda i: (jnp.einsum(  # noqa: E731
        "bnf,fhd->bhnd", x, w[:, i],
        preferred_element_type=jnp.float32).astype(x.dtype) +
        bias[i][None, :, None, :])
    q, k, v = proj(0), proj(1), proj(2)
    o = _attention_xla(q, k, v)
    return jnp.moveaxis(o, 1, 2).reshape(b, n, f)


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
