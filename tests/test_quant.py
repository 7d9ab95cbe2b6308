"""Int8 quantized solve path (ops/quant.py, model.quant=int8).

The reference has no quantization story; this is the framework's v5e
2x-peak serving path. These tests pin (a) the quantized matmul math
exactly against a numpy oracle, (b) closeness to the fp32 matmul,
(c) checkpoint interchangeability (identical param pytrees), and
(d) end-to-end accuracy on the REAL trained fixture — the same gate the
bf16 path passes in test_trained_model.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops.quant import (int8_dense, int8_matmul,
                                         quantize_channelwise,
                                         quantize_rowwise)


import pytest

def _np_int8_dense(x, k, b):
    """Numpy oracle of the exact quantized math in ops/quant.py."""
    x = x.astype(np.float32)
    k = k.astype(np.float32)
    s_x = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-30) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127).astype(np.int32)
    s_w = np.maximum(np.abs(k).max(0), 1e-30) / 127.0
    w_q = np.clip(np.round(k / s_w), -127, 127).astype(np.int32)
    return (x_q @ w_q).astype(np.float32) * s_x * s_w + b


def test_int8_dense_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 9, 32)).astype(np.float32)
    k = rng.normal(size=(32, 24)).astype(np.float32)
    b = rng.normal(size=(24,)).astype(np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(k),
                                jnp.asarray(b), out_dtype=jnp.float32))
    want = _np_int8_dense(x, k, b)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_int8_dense_close_to_fp32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 16, 64)).astype(np.float32)
    k = (rng.normal(size=(64, 48)) / 8).astype(np.float32)
    b = rng.normal(size=(48,)).astype(np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(k),
                                jnp.asarray(b), out_dtype=jnp.float32))
    want = x @ k + b
    # int8 with per-token/per-channel scales: ~1% relative error on the
    # pre-bias product for gaussian data
    err = np.abs(got - want).max()
    ref = np.abs(x @ k).max()
    assert err < 0.02 * ref, (err, ref)


def test_quantize_roundtrip_bounds():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(40, 24)).astype(np.float32))
    w_q, s_w = quantize_channelwise(w)
    assert w_q.dtype == jnp.int8
    # dequantized weight within half an LSB per channel (+ fp32 slack for
    # exact round-half draws)
    err = np.abs(np.asarray(w_q, np.float32) * np.asarray(s_w)
                 - np.asarray(w))
    assert (err / np.asarray(s_w)).max() < 0.502
    x = jnp.asarray(rng.normal(size=(6, 40)).astype(np.float32))
    x_q, s_x = quantize_rowwise(x)
    assert x_q.dtype == jnp.int8
    assert np.abs(np.asarray(x_q)).max() <= 127
    # int8 x int8 contraction accumulates in int32
    assert int8_matmul(x_q, w_q).dtype == jnp.int32


def test_zero_rows_quantize_to_zero():
    x = jnp.zeros((3, 16))
    x_q, s_x = quantize_rowwise(x)
    assert np.asarray(x_q).sum() == 0
    k = jnp.asarray(np.eye(16, dtype=np.float32))
    out = int8_dense(x, k, jnp.ones((16,)), out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_param_tree_identical_with_and_without_quant():
    """model.quant=int8 must consume unmodified checkpoints: the param
    pytree (paths, shapes, dtypes) is identical to the bf16/fp32 model's."""
    kwargs = dict(input_size=48, depth=2, hidden_size=64, num_heads=4)
    m_f, cfg = create_model("JPDVT", **kwargs, attn_impl="xla")
    m_q, _ = create_model("JPDVT", **kwargs, quant="int8")
    args = (jnp.zeros((1, 48, 48, 3)), jnp.array([0]),
            jnp.zeros((1, cfg.num_tokens, 8)))
    p_f = m_f.init(jax.random.key(0), *args)
    p_q = m_q.init(jax.random.key(0), *args)
    flat_f = jax.tree_util.tree_flatten_with_path(p_f)[0]
    flat_q = jax.tree_util.tree_flatten_with_path(p_q)[0]
    assert [(p, v.shape, v.dtype) for p, v in flat_f] == \
           [(p, v.shape, v.dtype) for p, v in flat_q]


def test_quant_forward_close_to_fp32():
    """On random (non-degenerate) params the int8 forward tracks fp32."""
    kwargs = dict(input_size=48, depth=2, hidden_size=64, num_heads=4)
    m_f, cfg = create_model("JPDVT", **kwargs, attn_impl="xla")
    m_q, _ = create_model("JPDVT", **kwargs, quant="int8")
    args = (jnp.zeros((1, 48, 48, 3)), jnp.array([0]),
            jnp.zeros((1, cfg.num_tokens, 8)))
    params = m_f.init(jax.random.key(0), *args)
    # init zeroes the adaLN/final layers; randomize so every quantized
    # matmul sees real data
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree.unflatten(treedef, [
        v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
        for v, k in zip(leaves, keys)])
    x = jax.random.normal(jax.random.key(2), (2, 48, 48, 3))
    t = jnp.array([17, 903])
    code = jax.random.normal(jax.random.key(3), (2, cfg.num_tokens, 8))
    img_f, code_f = m_f.apply(params, x, t, code)
    img_q, code_q = m_q.apply(params, x, t, code)
    # quantization noise accumulates over 2 blocks; demand close tracking
    denom = float(jnp.abs(code_f).max()) + 1e-9
    rel = float(jnp.abs(code_q - code_f).max()) / denom
    assert rel < 0.05, rel
    denom_i = float(jnp.abs(img_f).max()) + 1e-9
    assert float(jnp.abs(img_q - img_f).max()) / denom_i < 0.05


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_trained_model_solves_int8():
    """End-to-end gate: the trained fixture keeps solving under int8 —
    same threshold as the bf16 path (test_trained_model.py)."""
    import os

    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
    from jpdvt_mt_ntnu_tpu.tools.torch_convert import load_npz_params

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "tiny_jpdvt_48px.npz")
    model, cfg = create_model("JPDVT", input_size=48, depth=2,
                              hidden_size=64, num_heads=4, quant="int8")
    params = jax.tree.map(jnp.asarray, load_npz_params(fixture))
    ds = SyntheticPuzzles(48, n=32, seed=123)
    x = jnp.asarray(np.stack([ds[i] for i in range(32)]))
    solver = PuzzleSolver(model, cfg, create_diffusion("50"),
                          grid_size=3, mode="fast")
    res = solver.evaluate(params, x, jax.random.key(0))
    assert res.puzzle_accuracy >= 0.95, res.puzzle_accuracy
    assert res.patch_accuracy >= 0.97


def test_quant_config_plumbing():
    from jpdvt_mt_ntnu_tpu.utils.config import Config, apply_overrides

    cfg = apply_overrides(Config(), ["model.quant=int8"])
    assert cfg.model.overrides()["quant"] == "int8"
    assert "quant" not in Config().model.overrides()


def test_quant_service_solves():
    """Serving path: ServiceConfig(quant='int8') serves a full
    create->solve round trip with valid permutations."""
    import base64
    import io

    from PIL import Image

    from jpdvt_mt_ntnu_tpu.serve.service import PuzzleService, ServiceConfig

    svc = PuzzleService(ServiceConfig(
        image_size=48, depth=1, hidden_size=32, num_heads=2,
        sampling_steps=3, sampler_mode="fast", quant="int8",
        compute_dtype="float32"))
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = svc.solve_puzzle(buf.getvalue())
    assert sorted(out["details"]["predicted_order"]) == list(range(9))
    Image.open(io.BytesIO(base64.b64decode(out["solution_image"])))


def test_selective_quant_spec_parsing():
    from jpdvt_mt_ntnu_tpu.ops.quant import parse_quant_spec

    import pytest

    assert parse_quant_spec("") == (None, None)
    assert parse_quant_spec(None) == (None, None)
    assert parse_quant_spec("int8") == ("int8", None)
    assert parse_quant_spec("int8:8") == ("int8", 8)
    assert parse_quant_spec("int8:0") == ("int8", 0)
    with pytest.raises(ValueError):
        parse_quant_spec("int4")
    with pytest.raises(ValueError):
        parse_quant_spec("int8:x")


def test_selective_quant_depth_limit():
    """quant='int8:K' quantizes only the first K blocks: K=0 is bitwise
    the plain forward, K=depth is bitwise the full-int8 forward, and an
    intermediate K sits strictly between (differs from both).

    The large-grid rescue (PERF.md round-3 int8: 0.8906 vs 0.9873 puzzle
    at 16x16) keeps the late blocks — the ones feeding the 8-dim code
    regression — in the compute dtype."""
    kwargs = dict(input_size=48, depth=2, hidden_size=64, num_heads=4,
                  attn_impl="xla")
    m_f, cfg = create_model("JPDVT", **kwargs)
    m_q, _ = create_model("JPDVT", **kwargs, quant="int8")
    m_q0, _ = create_model("JPDVT", **kwargs, quant="int8:0")
    m_q1, _ = create_model("JPDVT", **kwargs, quant="int8:1")
    m_q2, _ = create_model("JPDVT", **kwargs, quant="int8:2")
    args = (jnp.zeros((1, 48, 48, 3)), jnp.array([0]),
            jnp.zeros((1, cfg.num_tokens, 8)))
    params = m_f.init(jax.random.key(0), *args)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree.unflatten(treedef, [
        v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
        for v, k in zip(leaves, keys)])
    x = jax.random.normal(jax.random.key(2), (2, 48, 48, 3))
    t = jnp.array([17, 903])
    code = jax.random.normal(jax.random.key(3), (2, cfg.num_tokens, 8))

    outs = {}
    for name, m in [("f", m_f), ("q", m_q), ("q0", m_q0), ("q1", m_q1),
                    ("q2", m_q2)]:
        img, c = m.apply(params, x, t, code)
        outs[name] = (np.asarray(img), np.asarray(c))

    # K=0 == plain, K=depth == full int8 (bitwise)
    np.testing.assert_array_equal(outs["q0"][1], outs["f"][1])
    np.testing.assert_array_equal(outs["q2"][1], outs["q"][1])
    # intermediate K differs from both and stays closer to fp32 than full
    assert not np.array_equal(outs["q1"][1], outs["f"][1])
    assert not np.array_equal(outs["q1"][1], outs["q"][1])
    err_full = np.abs(outs["q"][1] - outs["f"][1]).max()
    err_half = np.abs(outs["q1"][1] - outs["f"][1]).max()
    assert err_half <= err_full

    # param tree unchanged by the selective spec (checkpoints interchange)
    p_sel = m_q1.init(jax.random.key(0), *args)
    flat_f = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(p_sel)[0]
    assert [(p, v.shape) for p, v in flat_f] == \
           [(p, v.shape) for p, v in flat_s]
