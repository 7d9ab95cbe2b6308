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
    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0].astype(jnp.float32)
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
    """Fused backward: recompute softmax (flash-style) then dq/dk/dv."""
    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)              # (N, N)
    dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (N, N)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32)  # q already scaled
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


def default_impl() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def multihead_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        impl: str | None = None) -> jnp.ndarray:
    """Fused MHA. q, k, v: (B, H, N, Dh) -> (B, H, N, Dh).

    impl: "pallas" | "xla" | "interpret" | None (auto by backend).
    """
    impl = impl or default_impl()
    if impl == "pallas":
        return _attention_pallas(q, k, v)
    if impl == "interpret":
        return _attention_pallas(q, k, v, True)
    if impl == "xla":
        return _attention_xla(q, k, v)
    raise ValueError(f"unknown attention impl: {impl}")
