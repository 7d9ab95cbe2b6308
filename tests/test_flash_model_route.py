"""The attn_impl='flash' route produces the same DiT forward as XLA."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.models import create_model


def test_dit_forward_flash_matches_xla():
    kw = dict(input_size=48, depth=2, hidden_size=64, num_heads=4)
    xla_model, cfg = create_model("JPDVT", attn_impl="xla", **kw)
    # interpret=True is spelled via multihead/fused kernels only; for the
    # model route we run the Pallas flash kernel in interpret mode through
    # the CPU backend by monkeypatching is unnecessary: pallas_call with
    # interpret=False on CPU fails, so route through the interpret flag.
    from jpdvt_mt_ntnu_tpu.ops import flash_attention as fa

    orig = fa.fused_qkv_flash_attention

    def interp(qkv, num_heads, interpret=False):
        return orig(qkv, num_heads, interpret=True)

    fa.fused_qkv_flash_attention = interp
    try:
        flash_model, _ = create_model("JPDVT", attn_impl="flash", **kw)
        x = jax.random.normal(jax.random.key(0), (2, 48, 48, 3))
        t = jnp.array([3, 500])
        code = jax.random.normal(jax.random.key(1), (2, cfg.num_tokens,
                                                     cfg.code_dim))
        params = xla_model.init(jax.random.key(2), x, t, code)
        out_x = xla_model.apply(params, x, t, code)
        out_f = flash_model.apply(params, x, t, code)
        for a, b in zip(jax.tree.leaves(out_x), jax.tree.leaves(out_f)):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    finally:
        fa.fused_qkv_flash_attention = orig
