"""Pallas fused attention vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.ops.attention import multihead_attention


def _qkv(b=2, h=4, n=144, d=64, dtype=jnp.float32, key=0):
    ks = jax.random.split(jax.random.key(key), 3)
    shape = (b, h, n, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("n", [16, 144, 324])
def test_pallas_matches_xla(n):
    q, k, v = _qkv(n=n)
    ref = multihead_attention(q, k, v, impl="xla")
    out = multihead_attention(q, k, v, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-4)


def test_xla_matches_naive_softmax():
    q, k, v = _qkv(b=1, h=2, n=32, d=16)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (16 ** -0.5)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    out = multihead_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_backward_matches_xla():
    """custom_vjp: Pallas backward kernel grads == XLA autodiff grads."""
    q, k, v = _qkv(b=1, h=2, n=48, d=32, key=7)
    do = jax.random.normal(jax.random.key(8), q.shape)

    def f(impl):
        def loss(q, k, v):
            return jnp.sum(multihead_attention(q, k, v, impl=impl) * do)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    ref = f("xla")
    out = f("interpret")
    for a, b, name in zip(out, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4, err_msg=f"d{name}")


def test_bf16_path():
    q, k, v = _qkv(dtype=jnp.bfloat16, n=144)
    ref = multihead_attention(q, k, v, impl="xla")
    out = multihead_attention(q, k, v, impl="interpret")
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


def test_default_impl_geometry_routing(monkeypatch):
    """Routing mirrors the v5e measurements (tools/bench_attention.py):
    XLA at stock JPDVT sizes, whole-row Pallas 512-1296, flash beyond."""
    from jpdvt_mt_ntnu_tpu.ops import attention as A

    assert A.default_impl(144) == "xla"          # cpu backend -> always xla
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    assert A.default_impl(None) == "xla"
    assert A.default_impl(144) == "xla"
    assert A.default_impl(324) == "xla"
    assert A.default_impl(512) == "pallas"
    assert A.default_impl(1296) == "pallas"
    assert A.default_impl(1297) == "flash"
    assert A.default_impl(4096) == "flash"


def test_layout_variants_match_fused_qkv():
    """xla2 (no-moveaxis einsums) and xla_split (per-head projections) are
    measured layout experiments (PERF.md round 3 — both LOST to the fused
    path on hardware, kept selectable + documented); their math must equal
    the fused-qkv oracle."""
    from jpdvt_mt_ntnu_tpu.ops.attention import (fused_qkv_attention_xla,
                                                 fused_qkv_attention_xla2,
                                                 split_qkv_attention_xla)

    b, n, h, d = 2, 18, 4, 16
    f = h * d
    key = jax.random.key(3)
    kx, kw, kb, kq = jax.random.split(key, 4)
    x = jax.random.normal(kx, (b, n, f))
    w = jax.random.normal(kw, (f, 3 * f)) * 0.1
    bias = jax.random.normal(kb, (3 * f,)) * 0.1
    qkv = x @ w + bias
    ref = fused_qkv_attention_xla(qkv, h)
    np.testing.assert_allclose(np.asarray(fused_qkv_attention_xla2(qkv, h)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(split_qkv_attention_xla(x, w, bias, h)),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_model_layout_impls_match():
    """The DiT forward is impl-independent across the XLA layout variants."""
    from jpdvt_mt_ntnu_tpu.models import create_model

    outs = {}
    for impl in ("xla", "xla2", "xla_split"):
        model, cfg = create_model("DiT-S/8", input_size=32, attn_impl=impl)
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                            jnp.array([0]), jnp.zeros((1, 16, 8)))
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        code = jax.random.normal(jax.random.key(2), (2, 16, 8))
        outs[impl] = model.apply(params, x, jnp.array([5, 9]), code)
    for impl in ("xla2", "xla_split"):
        np.testing.assert_allclose(np.asarray(outs[impl][1]),
                                   np.asarray(outs["xla"][1]),
                                   rtol=1e-4, atol=1e-5, err_msg=impl)
