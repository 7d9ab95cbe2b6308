"""Converter round-trips and npz persistence; torch-layout equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.tools.torch_convert import (
    load_npz_params,
    params_to_torch_state_dict,
    save_npz_params,
    torch_state_dict_to_params,
)


def _params(depth=2):
    model, cfg = create_model("JPDVT", input_size=48, depth=depth,
                              hidden_size=64, num_heads=4, attn_impl="xla")
    params = model.init(jax.random.key(3), jnp.zeros((1, 48, 48, 3)),
                        jnp.array([0]), jnp.zeros((1, 9, 8)))
    return model, cfg, params


def test_roundtrip_through_torch_layout():
    model, cfg, params = _params()
    sd = params_to_torch_state_dict(params, depth=2, patch_size=16,
                                    in_channels=3, hidden_size=64)
    back, unused = torch_state_dict_to_params(sd, depth=2)
    assert unused == []
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                 sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_converted_params_run_identically():
    """Applying converted-back params must give identical outputs."""
    model, cfg, params = _params()
    sd = params_to_torch_state_dict(params, 2, 16, 3, 64)
    back, _ = torch_state_dict_to_params(sd, 2)
    x = jax.random.normal(jax.random.key(0), (2, 48, 48, 3))
    code = jax.random.normal(jax.random.key(1), (2, 9, 8))
    t = jnp.array([3, 500])
    img1, c1 = model.apply(params, x, t, code)
    img2, c2 = model.apply(jax.tree.map(jnp.asarray, back), x, t, code)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_patch_embed_conv_equivalence():
    """Our reshape+matmul patch embed == a real conv with the converted
    OIHW kernel (validates the layout math without needing timm)."""
    model, cfg, params = _params()
    sd = params_to_torch_state_dict(params, 2, 16, 3, 64)
    w = sd["x_embedder.proj.weight"]  # (D, C, p, p) OIHW
    b = sd["x_embedder.proj.bias"]
    x = np.asarray(jax.random.normal(jax.random.key(5), (1, 48, 48, 3)))

    # Direct conv with stride == kernel, NCHW like torch.
    xc = x.transpose(0, 3, 1, 2)
    p = 16
    tokens = []
    for i in range(3):
        for j in range(3):
            patch = xc[0, :, i * p:(i + 1) * p, j * p:(j + 1) * p]
            tokens.append(np.tensordot(w, patch, axes=([1, 2, 3], [0, 1, 2])) + b)
    conv_out = np.stack(tokens)  # (9, D)

    kernel = np.asarray(params["params"]["x_embedder"]["kernel"])
    bias = np.asarray(params["params"]["x_embedder"]["bias"])
    mine = (x.reshape(1, 3, p, 3, p, 3).transpose(0, 1, 3, 2, 4, 5)
            .reshape(9, p * p * 3) @ kernel + bias)
    np.testing.assert_allclose(mine, conv_out, rtol=1e-4, atol=1e-5)


def test_npz_save_load(tmp_path):
    _, _, params = _params(depth=1)
    path = str(tmp_path / "p.npz")
    save_npz_params(path, jax.tree.map(np.asarray, params))
    loaded = load_npz_params(path)
    a = jax.tree_util.tree_leaves_with_path(params)
    b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(a) == len(b)
    for (pa, va), (pb, vb) in zip(sorted(a, key=lambda x: str(x[0])),
                                   sorted(b, key=lambda x: str(x[0]))):
        np.testing.assert_array_equal(np.asarray(va), vb)


def test_unused_keys_reported():
    sd = {"bogus.weight": np.zeros((4, 4)), "pos_embed": np.zeros((1, 9, 64))}
    _, unused = torch_state_dict_to_params(sd, depth=1)
    assert unused == ["bogus.weight"]
