"""Sequence (context) parallelism: ring attention over a ``'seq'`` mesh axis.

The reference has no sequence-parallel story — its longest geometry is 324
tokens (SURVEY.md §5.7) and its only parallelism is DDP. This framework's
round-3 grid ladder pushed the production geometry past that (576 tokens at
24x24@384, 1024+ for hypothetical 512px fields), so context parallelism
earns a real implementation: activations shard over tokens, each chip holds
``N/s`` of the sequence, and attention — the one cross-token op in the DiT
— runs as a **ring**: K/V shards rotate around the 'seq' axis via
``lax.ppermute`` while each chip folds the visiting block into an
online-softmax accumulator (the RingAttention / flash-attention recurrence:
running row-max ``m``, normalizer ``l``, unnormalized output ``o``; fp32
accumulation regardless of input dtype).

Design, TPU-first:

- **Partial-manual shard_map** (same pattern as parallel/pipeline.py): only
  'seq' is manual; 'data'/'fsdp'/'model' stay auto, so the ring composes
  with the existing DP/FSDP/TP shardings unchanged and GSPMD still owns the
  batch/head dims inside the body.
- **Comm/compute overlap for free**: each ring tick is one
  ``collective-permute`` (neighbor-only ICI traffic, the cheapest pattern
  on a torus) followed by a block matmul; XLA schedules the permute of
  block ``i+1`` concurrently with the matmul of block ``i`` — the same
  overlap RingAttention hand-schedules, with s-1 permutes total.
- **Autodiff-native backward**: the ring is a ``lax.scan`` whose carried
  K/V rotate by ppermute; the transpose of ppermute is the reverse
  ppermute, so reverse-mode differentiation of the scan IS the backward
  ring (gradients circulate the opposite direction). No custom VJP.
- Params never shard over 'seq' (parallel/sharding.py specs leave it out
  -> replicated); GSPMD inserts the gradient psum over 'seq' exactly as it
  does over 'data'.

Exactness: full (non-causal) attention, no approximation — the online
softmax telescopes to the dense result; tests/test_sequence.py asserts
forward and gradient parity against the XLA oracle at fp32 and train-step
loss parity of a (data, seq) mesh vs pure DP on the virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _ring_core(q, k, v, axis: str, n_shards: int):
    """Online-softmax ring attention on LOCAL shards.

    q, k, v: [B, H, Nl, D] (token dim already sharded over ``axis``);
    returns [B, H, Nl, D] in q.dtype. All accumulation in fp32.
    """
    scale = q.shape[-1] ** -0.5
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    b, h, nl, d = q.shape
    qf = (q * scale).astype(q.dtype)

    # the accumulators are device-varying over 'seq' from tick 1 on; mark
    # the (constant) initial values as varying so the scan carry types match
    m0, l0, o0 = (lax.pcast(z, (axis,), to="varying") for z in (
        jnp.full((b, h, nl), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, nl), jnp.float32),
        jnp.zeros((b, h, nl, d), jnp.float32)))

    def tick(carry, _):
        k_blk, v_blk, m, l, o = carry
        # scores of local Q against the visiting K block, fp32 on the MXU
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * corr + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
                        preferred_element_type=jnp.float32)
        o = o * corr[..., None] + pv
        # rotate K/V to the neighbor; XLA overlaps this with the matmuls
        k_blk = lax.ppermute(k_blk, axis, perm)
        v_blk = lax.ppermute(v_blk, axis, perm)
        return (k_blk, v_blk, m_new, l, o), None

    (k_last, v_last, m, l, o), _ = lax.scan(
        tick, (k, v, m0, l0, o0), None, length=n_shards)
    del k_last, v_last
    return (o / l[..., None]).astype(q.dtype)


def ring_attention(qkv: jax.Array, num_heads: int, mesh: Mesh,
                   axis: str = "seq") -> jax.Array:
    """Sequence-parallel MHA core: fused-qkv layout in, attention out.

    qkv: [B, N, 3C] (the Attention module's fused projection output, any
    dtype); returns [B, N, C]. N must divide by the 'seq' axis size. Only
    the token dim is manually sharded — batch/feature dims stay auto, so
    the surrounding projections keep their DP/TP shardings.
    """
    n_shards = mesh.shape[axis]
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if n % n_shards:
        raise ValueError(f"tokens {n} not divisible by {axis}={n_shards}")

    def body(qkv_local):
        nl = qkv_local.shape[1]
        # [B, Nl, 3, H, D] -> 3 x [B, H, Nl, D]
        q, k, v = jnp.moveaxis(
            qkv_local.reshape(b, nl, 3, num_heads, d), 2, 0)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        o = _ring_core(q, k, v, axis, n_shards)
        return jnp.swapaxes(o, 1, 2).reshape(b, nl, c)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
        axis_names={axis})(qkv)


def sequence_sharding(mesh: Mesh, ndim: int = 3, token_dim: int = 1):
    """NamedSharding constraint for token-major activations ([B, N, C] by
    default): tokens over 'seq', batch over the data axes, rest replicated.
    Apply at block boundaries when running fully sequence-sharded."""
    from jax.sharding import NamedSharding

    from .mesh import batch_axes

    axes = batch_axes(mesh)
    lead = axes[0] if len(axes) == 1 else axes
    spec = [None] * ndim
    spec[0] = lead
    spec[token_dim] = "seq"
    return NamedSharding(mesh, P(*spec))
