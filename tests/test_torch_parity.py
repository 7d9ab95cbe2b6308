"""Torch-side activation parity for the DiT forward + checkpoint converter.

The converter's self-round-trip tests (test_tools.py) cannot catch a
CONSISTENT layout error — e.g. mis-ordering timm's fused-qkv (q|k|v, head,
head_dim) output dim — because such an error inverts cleanly. These tests
compare against the actual torch computation (reference semantics vendored
in tools/make_dit_goldens.py, mirroring image_model/models.py:101-293):

1. a committed golden npz (works without torch installed);
2. a live torch run with a different seed + geometry (torch is in-image).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jpdvt_mt_ntnu_tpu.models.dit import DiT, DiTConfig
from jpdvt_mt_ntnu_tpu.tools.torch_convert import torch_state_dict_to_params

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "torch_dit_goldens.npz")


def _flax_forward(cfg: DiTConfig, sd: dict, x_nchw, t, code):
    params, unused = torch_state_dict_to_params(sd, cfg.depth)
    assert unused == [], f"converter left torch keys unused: {unused}"
    params = jax.tree.map(jnp.asarray, params)
    model = DiT(cfg)
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    img, code_out = model.apply(params, x_nhwc, jnp.asarray(t),
                                jnp.asarray(code))
    return np.transpose(np.asarray(img), (0, 3, 1, 2)), np.asarray(code_out)


def test_converted_forward_matches_torch_golden():
    z = np.load(GOLDEN)
    cfg = DiTConfig(
        input_size=int(z["cfg.input_size"]), patch_size=int(z["cfg.patch_size"]),
        in_channels=int(z["cfg.in_channels"]), hidden_size=int(z["cfg.hidden_size"]),
        depth=int(z["cfg.depth"]), num_heads=int(z["cfg.num_heads"]),
        mlp_ratio=float(z["cfg.mlp_ratio"]), code_dim=int(z["cfg.code_dim"]),
        code_head_hidden=int(z["cfg.code_head_hidden"]),
        dtype=jnp.float32, attn_impl="xla")
    sd = {k[len("sd."):]: z[k] for k in z.files if k.startswith("sd.")}
    img, code_out = _flax_forward(cfg, sd, z["in_x_nchw"], z["in_t"],
                                  z["in_code"])
    np.testing.assert_allclose(img, z["out_img_nchw"], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(code_out, z["out_code"], atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("geom", [
    dict(input_size=16, patch_size=4, in_channels=3, hidden_size=32,
         depth=1, num_heads=2, mlp_ratio=2.0, code_dim=8, code_head_hidden=12),
    dict(input_size=24, patch_size=8, in_channels=3, hidden_size=48,
         depth=3, num_heads=3, mlp_ratio=4.0, code_dim=8, code_head_hidden=16),
])
def test_converted_forward_matches_live_torch(geom):
    torch = pytest.importorskip("torch")  # noqa: F841
    from jpdvt_mt_ntnu_tpu.tools.make_dit_goldens import (
        build_torch_dit, run_torch_forward, torch_state_dict_for_convert)

    model = build_torch_dit(geom, seed=geom["depth"])
    rng = np.random.RandomState(geom["hidden_size"])
    B = 3
    x = rng.randn(B, geom["in_channels"], geom["input_size"],
                  geom["input_size"]).astype(np.float32)
    t = rng.randint(0, 1000, size=B).astype(np.int64)
    n_tokens = (geom["input_size"] // geom["patch_size"]) ** 2
    code = rng.randn(B, n_tokens, geom["code_dim"]).astype(np.float32)
    t_img, t_code = run_torch_forward(model, x, t, code)

    cfg = DiTConfig(dtype=jnp.float32, attn_impl="xla", **geom)
    img, code_out = _flax_forward(cfg, torch_state_dict_for_convert(model),
                                  x, t, code)
    np.testing.assert_allclose(img, t_img, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(code_out, t_code, atol=2e-5, rtol=2e-5)


def test_converter_rejects_nothing_silently():
    """An unknown torch key must show up in `unused`, never vanish."""
    z = np.load(GOLDEN)
    sd = {k[len("sd."):]: z[k] for k in z.files if k.startswith("sd.")}
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    _, unused = torch_state_dict_to_params(sd, int(z["cfg.depth"]))
    assert unused == ["mystery.weight"]
