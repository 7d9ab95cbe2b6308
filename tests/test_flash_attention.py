"""Flash-tiled attention vs the XLA oracle (interpret mode on CPU).

Covers the VMEM-capped whole-row kernels' replacement for long sequences:
values and all three gradients must match plain einsum attention, including
when the sequence length is not a multiple of the block size (padding +
masking path) and when multiple KV blocks stream through the accumulator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.ops.attention import _attention_xla
from jpdvt_mt_ntnu_tpu.ops.flash_attention import flash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype=dtype)


CASES = [
    # (B, H, N, D, block_q, block_k)  — N spans: single-block, multi-block
    # divisible, multi-block with padding (the JPDVT 144/324 geometries).
    (2, 3, 64, 64, 128, 128),      # tiny: single block, sublane round-up
    (2, 2, 144, 64, 128, 128),     # flagship geometry, padded final block
    (1, 2, 256, 64, 128, 128),     # exactly two blocks each way
    (1, 2, 324, 48, 128, 128),     # 288px geometry, d=48, padding
    (1, 1, 400, 64, 128, 96),      # uneven q/kv blocks, both padded
]


@pytest.mark.parametrize("b,h,n,d,bq,bk", CASES)
def test_forward_matches_xla(b, h, n, d, bq, bk):
    q, k, v = (_rand((b, h, n, d), i) for i in range(3))
    out = flash_attention(q, k, v, bq, bk, True)
    ref = _attention_xla(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,h,n,d,bq,bk", CASES)
def test_grads_match_xla(b, h, n, d, bq, bk):
    q, k, v = (_rand((b, h, n, d), 10 + i) for i in range(3))
    w = _rand((b, h, n, d), 99)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bq, bk, True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(q, k, v) * w)

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g, gr, "qkv"):
        np.testing.assert_allclose(a, b_, atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


def test_bf16_forward_close():
    q, k, v = (_rand((2, 2, 144, 64), 20 + i, jnp.bfloat16) for i in range(3))
    out = flash_attention(q, k, v, 128, 128, True)
    ref = _attention_xla(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(out.astype(jnp.float32),
                               ref.astype(jnp.float32), atol=2e-2, rtol=2e-2)


def test_long_sequence_shape_smoke():
    # Past the whole-row kernels' ~1.3k-token cap: just shape/finite check
    # (full oracle comparison at 2k tokens is slow in interpret mode).
    q, k, v = (_rand((1, 1, 2048, 64), 30 + i) for i in range(3))
    out = flash_attention(q, k, v, 256, 256, True)
    assert out.shape == (1, 1, 2048, 64)
    assert bool(jnp.isfinite(out).all())
