"""DiT model: shapes, init parity properties, registry, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.models import DIT_CONFIGS, create_model


def _tiny():
    model, cfg = create_model("JPDVT", input_size=48, depth=2,
                              hidden_size=64, num_heads=4, attn_impl="xla")
    return model, cfg


def test_forward_shapes():
    model, cfg = _tiny()
    b = 2
    x = jnp.zeros((b, 48, 48, 3))
    t = jnp.array([0, 999])
    code = jnp.zeros((b, cfg.num_tokens, 8))
    params = model.init(jax.random.key(0), x, t, code)
    img, out_code = model.apply(params, x, t, code)
    assert img.shape == (b, 48, 48, 3)
    assert out_code.shape == (b, cfg.num_tokens, 8)
    assert cfg.num_tokens == 9  # 48/16 = 3 per side


def test_zero_init_heads():
    """adaLN-Zero: with fresh params the final layer output must be zero
    (zero-init final linear + zero-init modulations, models.py:216-225)."""
    model, cfg = _tiny()
    x = jax.random.normal(jax.random.key(1), (2, 48, 48, 3))
    t = jnp.array([5, 10])
    code = jax.random.normal(jax.random.key(2), (2, cfg.num_tokens, 8))
    params = model.init(jax.random.key(0), x, t, code)
    img, out_code = model.apply(params, x, t, code)
    np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)
    # code head sees zeros -> silu(b1)=const -> code_out is a constant bias
    c = np.asarray(out_code)
    np.testing.assert_allclose(c, np.broadcast_to(c[0:1, 0:1], c.shape), atol=1e-6)


def test_timestep_changes_output_after_training_step():
    """One gradient step breaks the zero-init symmetry; t must then matter."""
    model, cfg = _tiny()
    x = jax.random.normal(jax.random.key(1), (1, 48, 48, 3))
    code = jax.random.normal(jax.random.key(2), (1, cfg.num_tokens, 8))
    params = model.init(jax.random.key(0), x, jnp.array([0]), code)

    def loss(p):
        # MSE against nonzero targets (like the real training loss) so the
        # zero-init outputs still produce gradients.
        img, c = model.apply(p, x, jnp.array([3]), code)
        return ((c - code) ** 2).mean() + ((img - x) ** 2).mean()

    # adaLN-Zero needs a few steps before conditioning paths carry gradient
    # (the zero final linear blocks backprop into the modulations at init).
    for _ in range(3):
        g = jax.grad(loss)(params)
        params = jax.tree.map(lambda a, b: a - 0.1 * b, params, g)
    _, c1 = model.apply(params, x, jnp.array([3]), code)
    _, c2 = model.apply(params, x, jnp.array([700]), code)
    assert float(np.abs(np.asarray(c1) - np.asarray(c2)).max()) > 0.0


def test_registry_complete():
    expected = {
        "DiT-XL/2", "DiT-XL/4", "DiT-XL/8", "DiT-L/2", "DiT-L/4", "DiT-L/8",
        "DiT-B/2", "DiT-B/4", "DiT-B/8", "DiT-S/2", "DiT-S/4", "DiT-S/8",
        "JPDVT", "JPDVT-S", "JPDVT-T", "JPDVT-MoE",
    }
    assert set(DIT_CONFIGS) == expected
    assert DIT_CONFIGS["JPDVT"] == dict(depth=12, hidden_size=768,
                                        patch_size=16, num_heads=12)


def test_jpdvt_param_count():
    """Flagship JPDVT: 12 x 768 DiT-B-like trunk -> ~131M params (the same
    arithmetic as the reference's torch model: ~10.6M/block x 12 + embeds)."""
    model, cfg = create_model("JPDVT", input_size=192, attn_impl="xla")
    params = model.init(jax.random.key(0), jnp.zeros((1, 192, 192, 3)),
                        jnp.array([0]), jnp.zeros((1, cfg.num_tokens, 8)))
    n = sum(p.size for p in jax.tree.leaves(params))
    assert 115e6 < n < 145e6, n


@pytest.mark.parametrize("name,size", [("JPDVT-T", 256), ("JPDVT-S", 192)])
def test_other_patch_sizes_work(name, size):
    """Reference defect fixed: JPDVT-S/T forward passes actually run
    (the reference hardcodes the code head at 768-in, models.py:177)."""
    model, cfg = create_model(name, input_size=size, depth=1, attn_impl="xla")
    x = jnp.zeros((1, size, size, 3))
    code = jnp.zeros((1, cfg.num_tokens, 8))
    params = model.init(jax.random.key(0), x, jnp.array([0]), code)
    img, c = model.apply(params, x, jnp.array([0]), code)
    assert img.shape == (1, size, size, 3)
    assert c.shape == (1, cfg.num_tokens, 8)


def test_bf16_compute():
    model, cfg = create_model("JPDVT", input_size=48, depth=1,
                              hidden_size=64, num_heads=4,
                              dtype=jnp.bfloat16, attn_impl="xla")
    x = jax.random.normal(jax.random.key(0), (1, 48, 48, 3))
    code = jax.random.normal(jax.random.key(1), (1, 9, 8))
    params = model.init(jax.random.key(2), x, jnp.array([0]), code)
    img, c = model.apply(params, x, jnp.array([0]), code)
    # params stay fp32, outputs are fp32
    assert jax.tree.leaves(params)[0].dtype == jnp.float32
    assert img.dtype == jnp.float32 and c.dtype == jnp.float32
