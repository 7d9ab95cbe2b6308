"""Flash-tiled (chunked-KV) attention in Pallas, FlashAttention-2 style.

The whole-row kernels in :mod:`.attention` hold the full (N x N) score
matrix in VMEM, which is the right shape for JPDVT's tiny sequences but
caps out around ~1.3k tokens (PERF.md round 2). This module removes that
cap: the score matrix is never materialized — the kernel streams KV blocks
through VMEM with an online softmax (running max `m`, running normalizer
`l`, rescaled output accumulator), so VMEM use is O(block^2) regardless of
sequence length. The backward pass is the FlashAttention-2 recomputation
scheme: the forward saves only the row log-sum-exp (LSE); two kernels then
recompute probabilities blockwise to produce dq (KV-streaming) and dk/dv
(Q-streaming).

Reference parity note: the reference gets flash attention implicitly from
torch SDPA (image_model/models.py:16,108 via timm). Semantics here match
timm exactly: scale = head_dim**-0.5 on q, no mask, no dropout; the XLA
einsum in attention.py is the correctness oracle.

TPU mapping:
- grid = (batch, heads, q-blocks, kv-blocks) with the KV axis innermost —
  Pallas TPU iterates the last grid axis fastest and sequentially, so VMEM
  scratch accumulators carry across the KV sweep of one Q block
  ("arbitrary" dimension semantics); the outer three axes are parallel.
- m/l live in (block_q, 128) scratch (fp32 min-tile lane width); the
  output accumulator is (block_q, head_dim) fp32.
- Sequence lengths are padded to the block size; padded KV columns are
  masked to -inf with a static iota (no SMEM traffic), padded Q rows are
  computed harmlessly and sliced off on the host side. Zero-padded dO
  makes padded rows contribute exactly 0 to dk/dv, so no masking is needed
  in the backward kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # fp32 tile lane width; m/l scratch trailing dim

_NEG_INF = float("-inf")


def _kv_mask(s, kv_idx, block_k: int, n_valid: int):
    """Mask score columns that fall beyond the un-padded KV length."""
    col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < n_valid, s, _NEG_INF)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale: float, block_k: int, n_valid: int, kv_steps: int,
                save_lse: bool):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # MXU operands in the input dtype (bf16 in production), fp32
    # accumulation + softmax stats — the fp32-everywhere variant measured
    # ~4x slower (fp32 MXU path).
    q = q_ref[0, 0] * scale                              # (bq, d)
    k = k_ref[0, 0]                                      # (bk, d)
    v = v_ref[0, 0]                                      # (bk, d)
    s = jax.lax.dot_general(                             # (bq, bk) fp32
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if n_valid % block_k:
        # Only the final KV block can contain padded columns, but masking
        # unconditionally (vs lax.cond on the block index) is pure VPU
        # compare+select — cheaper than a Mosaic branch and always legal.
        s = _kv_mask(s, kv_idx, block_k, n_valid)

    m_prev = m_scr[...]                                  # (bq, LANES)
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)                   # broadcast -> lanes
    alpha = jnp.exp(m_prev - m_new)                      # (bq, LANES)
    e = jnp.exp(s - m_new[:, :1])                        # (bq, bk)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    m_scr[...] = m_new
    acc_scr[...] = (acc_scr[...] * alpha[:, :1]
                    + jnp.dot(e.astype(v.dtype), v,
                              preferred_element_type=jnp.float32))

    @pl.when(kv_idx == kv_steps - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        if save_lse:
            lse_ref[0, 0] = m_scr[...] + jnp.log(l_scr[...])


def _pad_seq(x, block: int):
    n = x.shape[2]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.jit, static_argnames=(
    "block_q", "block_k", "save_lse", "interpret"))
def _flash_fwd(q, k, v, block_q: int, block_k: int, save_lse: bool,
               interpret: bool):
    b, h, n, d = q.shape
    scale = d ** -0.5
    qp = _pad_seq(q, block_q)
    kp = _pad_seq(k, block_k)
    vp = _pad_seq(v, block_k)
    nq, nk = qp.shape[2] // block_q, kp.shape[2] // block_k

    qspec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0),
                          memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, block_q, LANES),
                         lambda b_, h_, iq, ik: (b_, h_, iq, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(qp.shape, q.dtype),
        jax.ShapeDtypeStruct((b, h, qp.shape[2], LANES), jnp.float32),
    )
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k,
                          n_valid=n, kv_steps=nk, save_lse=save_lse),
        grid=(b, h, nq, nk),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=(qspec, lspec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (2 * n * n * d),
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qp, kp, vp)
    return o[:, :, :n], (lse[:, :, :n, :1] if save_lse else None)


# ---------------------------------------------------------------------------
# Backward (FlashAttention-2 recomputation)
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, dq_scr,
               *, scale: float, block_k: int, n_valid: int, kv_steps: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0] * scale
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    o = o_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]                            # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if n_valid % block_k:
        s = _kv_mask(s, kv_idx, block_k, n_valid)
    p = jnp.exp(s - lse)                                  # (bq, bk) fp32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1,
                    keepdims=True)                        # (bq, 1)
    ds = (p * (dp - delta)).astype(k.dtype)
    dq_scr[...] += jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    @pl.when(kv_idx == kv_steps - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, scale: float, block_k: int, n_valid: int,
                q_steps: int):
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0] * scale
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    o = o_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]

    s = jax.lax.dot_general(                              # (bq, bk)
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if n_valid % block_k:
        s = _kv_mask(s, kv_idx, block_k, n_valid)
    p = jnp.exp(s - lse)
    pc = p.astype(do.dtype)
    # Padded Q rows carry do == 0, so they add exactly 0 to dk/dv; no row
    # masking needed.
    dv_scr[...] += jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)               # (bq, bk)
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(q_idx == q_steps - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_bwd(q, k, v, o, lse, do, block_q: int, block_k: int,
               interpret: bool):
    b, h, n, d = q.shape
    scale = d ** -0.5
    qp, op, dop = (_pad_seq(x, block_q) for x in (q, o, do))
    kp, vp = (_pad_seq(x, block_k) for x in (k, v))
    nq, nk = qp.shape[2] // block_q, kp.shape[2] // block_k
    # LSE of padded (zero) Q rows against real keys is finite, but the rows
    # were sliced off in the forward — recompute a harmless finite value
    # (zeros) for the padded tail.
    lsep = _pad_seq(jnp.broadcast_to(lse, (b, h, n, LANES)), block_q)

    def qix(b_, h_, iq, ik):
        return (b_, h_, iq, 0)

    def kix(b_, h_, iq, ik):
        return (b_, h_, ik, 0)

    qspec = pl.BlockSpec((1, 1, block_q, d), qix, memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, block_k, d), kix, memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, block_q, LANES), qix, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k,
                          n_valid=n, kv_steps=nk),
        grid=(b, h, nq, nk),
        in_specs=[qspec, kvspec, kvspec, qspec, qspec, lspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, op, dop, lsep)

    # dk/dv: swap loop order — grid axis 2 indexes KV blocks, the innermost
    # axis sweeps Q blocks.
    def qix2(b_, h_, ik, iq):
        return (b_, h_, iq, 0)

    def kix2(b_, h_, ik, iq):
        return (b_, h_, ik, 0)

    qspec2 = pl.BlockSpec((1, 1, block_q, d), qix2, memory_space=pltpu.VMEM)
    kvspec2 = pl.BlockSpec((1, 1, block_k, d), kix2, memory_space=pltpu.VMEM)
    lspec2 = pl.BlockSpec((1, 1, block_q, LANES), qix2, memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_k=block_k,
                          n_valid=n, q_steps=nq),
        grid=(b, h, nk, nq),
        in_specs=[qspec2, kvspec2, kvspec2, qspec2, qspec2, lspec2],
        out_specs=(kvspec2, kvspec2),
        out_shape=(jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, op, dop, lsep)
    return dq[:, :, :n], dk[:, :, :n], dv[:, :, :n]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _pick_block(n: int, requested: int, dtype=None) -> int:
    """Largest tile <= requested that is sublane-aligned; tiny sequences
    run as a single block. Sub-fp32 dtypes need (16, 128) native tiles on
    TPU, so bf16/fp16 round up to 16 sublanes (a forced flash call at e.g.
    N=136 bf16 would otherwise fail to lower on hardware)."""
    sub = 8 if dtype is None or jnp.dtype(dtype).itemsize >= 4 else 16
    if n <= requested:
        return max(sub, -(-n // sub) * sub)
    return requested


# Default tiles are LARGE (512 x 1024): the flash grid launches one
# program per (batch, head, q-block, kv-block), and with 128-token tiles
# the per-step (128, 64) x (64, 128) matmuls measured ~2% MXU utilization
# at 4k tokens — grid/step overhead dominated. 512 x 1024 tiles keep
# VMEM use ~6 MB and feed the MXU full-width operands.
BLOCK_Q = 512
BLOCK_K = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, block_q: int = BLOCK_Q, block_k: int = BLOCK_K,
                    interpret: bool = False):
    """Streaming-KV attention: (B, H, N, D) -> (B, H, N, D).

    Same semantics as :func:`.attention._attention_xla` (timm: q-scaling,
    no mask, no dropout) with O(N) memory — use for sequences past the
    whole-row kernels' ~1.3k-token VMEM cap. Differentiable (FA2 backward).
    """
    bq = _pick_block(q.shape[2], block_q, q.dtype)
    bk = _pick_block(k.shape[2], block_k, k.dtype)
    o, _ = _flash_fwd(q, k, v, bq, bk, False, interpret)
    return o


def fused_qkv_flash_attention(qkv, num_heads: int, interpret: bool = False):
    """Flash attention straight from the fused qkv projection.

    qkv: (B, N, 3*H*Dh) in [q|k|v][head][dim] feature order -> (B, N, H*Dh).
    Unlike :func:`.attention.fused_qkv_attention`, this DOES pay the head
    transposes — at the long sequence lengths where flash tiling matters
    the O(N^2) attention math dwarfs the O(N) layout cost.
    """
    b, n, f = qkv.shape
    d = f // (3 * num_heads)
    q, k, v = (jnp.moveaxis(a.reshape(b, n, num_heads, d), 2, 1)
               for a in jnp.split(qkv, 3, axis=-1))
    o = flash_attention(q, k, v, interpret=interpret)
    return jnp.moveaxis(o, 1, 2).reshape(b, n, num_heads * d)


def _flash_vjp_fwd(q, k, v, block_q, block_k, interpret):
    bq = _pick_block(q.shape[2], block_q, q.dtype)
    bk = _pick_block(k.shape[2], block_k, k.dtype)
    o, lse = _flash_fwd(q, k, v, bq, bk, True, interpret)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    bq = _pick_block(q.shape[2], block_q, q.dtype)
    bk = _pick_block(k.shape[2], block_k, k.dtype)
    return _flash_bwd(q, k, v, o, lse, do, bq, bk, interpret)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
