"""fused_qkv_attention (transpose-free) vs the XLA oracle, fwd + bwd."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.ops.attention import (
    fused_qkv_attention,
    fused_qkv_attention_xla,
    multihead_attention,
)


def _qkv(b=2, n=144, h=4, d=32, key=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), (b, n, 3 * h * d), dtype)


@pytest.mark.parametrize("n,h,d", [(144, 4, 32), (16, 2, 64), (324, 3, 64)])
def test_fused_matches_xla(n, h, d):
    qkv = _qkv(n=n, h=h, d=d)
    ref = fused_qkv_attention_xla(qkv, h)
    out = fused_qkv_attention(qkv, h, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-4)


def test_fused_xla_matches_unfused():
    """The fused-qkv XLA path equals splitting heads by hand (layout check
    against the timm [q|k|v][head][dim] convention)."""
    b, n, h, d = 2, 16, 3, 8
    qkv = _qkv(b=b, n=n, h=h, d=d, key=3)
    q, k, v = (a.reshape(b, n, h, d) for a in jnp.split(qkv, 3, -1))
    q, k, v = (jnp.moveaxis(a, 2, 1) for a in (q, k, v))
    ref = multihead_attention(q, k, v, impl="xla")
    ref = jnp.moveaxis(ref, 1, 2).reshape(b, n, h * d)
    out = fused_qkv_attention_xla(qkv, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_backward_matches_xla():
    qkv = _qkv(b=1, n=48, h=2, d=32, key=7)
    do = jax.random.normal(jax.random.key(8), (1, 48, 64))

    def g(fn, *extra):
        return jax.grad(lambda a: jnp.sum(fn(a, 2, *extra) * do))(qkv)

    ref = g(lambda a, h: fused_qkv_attention_xla(a, h))
    out = g(fused_qkv_attention, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("bb", [1, 2, 4])
def test_batch_packed_matches_xla(bb):
    """Round 3: several batch items per program (the launch-overhead fix
    for tiny N) — forward and backward vs the XLA oracle, incl. a batch
    size the block doesn't divide (auto-halves)."""
    for b in (4, 6):
        qkv = _qkv(b=b, n=48, h=4, d=32, key=bb * 10 + b)
        ref = fused_qkv_attention_xla(qkv, 4)
        out = fused_qkv_attention(qkv, 4, True, bb=bb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=2e-4)
        do = jax.random.normal(jax.random.key(99), ref.shape)
        g_ref = jax.grad(lambda a: jnp.sum(
            fused_qkv_attention_xla(a, 4) * do))(qkv)
        g = jax.grad(lambda a: jnp.sum(
            fused_qkv_attention(a, 4, True, bb=bb) * do))(qkv)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-3, atol=2e-4)
