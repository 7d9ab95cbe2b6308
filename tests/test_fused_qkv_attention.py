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


def _block_weights(h, d, hidden, key=0):
    ks = jax.random.split(jax.random.key(key), 4)
    return (jax.random.normal(ks[0], (3 * h, hidden, d)) * 0.2,
            jax.random.normal(ks[1], (3 * h, 1, d)) * 0.2,
            jax.random.normal(ks[2], (h, d, hidden)) * 0.2,
            jax.random.normal(ks[3], (1, hidden)) * 0.2)


@pytest.mark.parametrize("bb", [1, 2, 4])
@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_attention_block_kernel_matches_xla(bb):
    """Round 3: the whole attention sublayer (qkv proj + MHA + out proj)
    as one program, several batch items packed per program — forward vs
    the XLA reference, incl. a batch the block doesn't divide
    (auto-halves)."""
    from jpdvt_mt_ntnu_tpu.ops.attention import (fused_attention_block,
                                                 fused_attention_block_xla)

    h, d, hidden, n = 4, 32, 128, 48
    w = _block_weights(h, d, hidden)
    for b in (4, 6):
        x = jax.random.normal(jax.random.key(bb * 10 + b), (b, n, hidden))
        ref = fused_attention_block_xla(x, *w, h)
        out = fused_attention_block(x, *w, h, True, bb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=1e-3)


def test_attention_block_backward_is_xla_reference():
    """The block's custom VJP differentiates the XLA reference exactly."""
    from jpdvt_mt_ntnu_tpu.ops.attention import (fused_attention_block,
                                                 fused_attention_block_xla)

    h, d, hidden, n = 2, 16, 32, 24
    w = _block_weights(h, d, hidden, key=5)
    x = jax.random.normal(jax.random.key(6), (2, n, hidden))

    g = jax.grad(lambda x_, w0: jnp.sum(
        fused_attention_block(x_, w0, *w[1:], h, True, 1) ** 2),
        argnums=(0, 1))(x, w[0])
    g_ref = jax.grad(lambda x_, w0: jnp.sum(
        fused_attention_block_xla(x_, w0, *w[1:], h) ** 2),
        argnums=(0, 1))(x, w[0])
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dit_block_impl_matches_xla_impl():
    """The model with attn_impl='block' computes the same function as
    attn_impl='xla' (same params — paths are preserved)."""
    from jpdvt_mt_ntnu_tpu.models import create_model

    x = jax.random.normal(jax.random.key(1), (2, 48, 48, 3))
    t = jnp.array([3, 870])
    code = jax.random.normal(jax.random.key(2), (2, 9, 8))
    m_xla, cfg = create_model("JPDVT", input_size=48, depth=2,
                              hidden_size=64, num_heads=4, attn_impl="xla")
    params = m_xla.init(jax.random.key(0), x, t, code)
    m_blk, _ = create_model("JPDVT", input_size=48, depth=2, hidden_size=64,
                            num_heads=4, attn_impl="block_interpret")
    img_a, code_a = m_xla.apply(params, x, t, code)
    img_b, code_b = m_blk.apply(params, x, t, code)
    np.testing.assert_allclose(np.asarray(code_b), np.asarray(code_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               rtol=1e-4, atol=1e-4)
