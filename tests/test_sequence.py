"""Sequence (context) parallelism: ring attention over the 'seq' axis.

Exactness is the whole contract: ring attention is dense full attention
computed blockwise with K/V rotating over ``lax.ppermute`` and an
online-softmax accumulator (parallel/sequence.py) — no approximation — so
every test here is a parity test against the plain XLA oracle on the
virtual 8-device CPU mesh. The reference has nothing to compare against
(no sequence parallelism of any kind; its only parallelism is DDP,
train_JPDVT.py:231).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Long-running parity suite: excluded from the fast tier (pytest -m 'not slow');
# the FULL suite remains the round gate (README quick start shows both).
pytestmark = pytest.mark.slow

from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops.attention import fused_qkv_attention_xla
from jpdvt_mt_ntnu_tpu.parallel import (MeshSpec, batch_sharding, make_mesh,
                                        ring_attention, state_shardings)
from jpdvt_mt_ntnu_tpu.parallel.sequence import sequence_sharding


def _mesh(data=2, seq=4):
    return make_mesh(MeshSpec(data=data, seq=seq),
                     devices=jax.devices()[:data * seq])


def _qkv(b=2, n=24, h=4, d=8, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.key(seed), (b, n, 3 * h * d), dtype)


def test_ring_matches_xla_forward():
    mesh = _mesh()
    qkv = _qkv()
    ref = fused_qkv_attention_xla(qkv, 4)
    out = jax.jit(lambda q: ring_attention(q, 4, mesh))(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_matches_xla_forward_bf16():
    # production dtype: fp32 accumulation inside, bf16 in/out
    mesh = _mesh()
    qkv = _qkv(dtype=jnp.bfloat16)
    ref = fused_qkv_attention_xla(qkv, 4)
    out = jax.jit(lambda q: ring_attention(q, 4, mesh))(qkv)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_ring_gradient_matches_xla():
    mesh = _mesh()
    qkv = _qkv()
    tgt = jax.random.normal(jax.random.key(9), qkv.shape[:2] + (32,))

    def loss(fn):
        return lambda q: jnp.mean((fn(q) - tgt) ** 2)

    g_ref = jax.grad(loss(lambda q: fused_qkv_attention_xla(q, 4)))(qkv)
    g_ring = jax.jit(jax.grad(loss(lambda q: ring_attention(q, 4, mesh))))(qkv)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


def test_ring_with_sharded_inputs():
    # tokens pre-sharded over 'seq', batch over 'data' — the training
    # placement; result must be unchanged.
    mesh = _mesh()
    qkv = _qkv(b=4)
    ref = fused_qkv_attention_xla(qkv, 4)
    qkv_s = jax.device_put(qkv, sequence_sharding(mesh))
    out = jax.jit(lambda q: ring_attention(q, 4, mesh))(qkv_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("seq,n,h,d", [(2, 16, 2, 4), (4, 16, 1, 8),
                                       (8, 24, 2, 4), (2, 18, 3, 8)])
def test_ring_matches_xla_across_shard_counts(seq, n, h, d):
    mesh = make_mesh(MeshSpec(data=8 // seq, seq=seq),
                     devices=jax.devices()[:8])
    qkv = jax.random.normal(jax.random.key(seq * 31 + n),
                            (2, n, 3 * h * d))
    ref = fused_qkv_attention_xla(qkv, h)
    out = jax.jit(lambda q: ring_attention(q, h, mesh))(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_rejects_indivisible_tokens():
    mesh = _mesh()
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(_qkv(n=25), 4, mesh)


def test_ring_hlo_contains_collective_permute():
    mesh = _mesh()
    qkv = _qkv()
    hlo = jax.jit(lambda q: ring_attention(q, 4, mesh)).lower(qkv).compile()
    text = hlo.as_text()
    assert re.search(r"collective-permute", text), \
        "ring attention must lower to collective-permute over 'seq'"


def _tiny_model(seq_mesh=None, attn_impl="xla"):
    return create_model("JPDVT", input_size=48, depth=2, hidden_size=64,
                        num_heads=4, patch_size=8,  # 36 tokens
                        attn_impl=attn_impl, seq_mesh=seq_mesh)


def test_model_forward_parity_ring_vs_xla():
    # 36 tokens: seq=2 -> 18 tokens per shard
    mesh = _mesh(data=4, seq=2)
    model_x, cfg = _tiny_model()
    model_r, _ = _tiny_model(seq_mesh=mesh, attn_impl="ring")
    x = jax.random.normal(jax.random.key(1), (2, 48, 48, 3))
    t = jnp.array([5, 7])
    code = jax.random.normal(jax.random.key(2), (2, cfg.num_tokens, 8))
    params = model_x.init(jax.random.key(0), x, t, code)
    img_x, code_x = model_x.apply(params, x, t, code)
    img_r, code_r = jax.jit(model_r.apply)(params, x, t, code)
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(code_r), np.asarray(code_x),
                               atol=1e-5, rtol=1e-5)


def test_train_step_sp_composes_with_fsdp():
    """(data=2, fsdp=2, seq=2): ring attention inside a ZeRO-sharded step —
    GSPMD all-gathers the fsdp-sharded weights around the manual 'seq'
    region. Runs one step; loss finite and params stay fsdp-sharded."""
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
    from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
    from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    mesh = make_mesh(MeshSpec(data=2, fsdp=2, seq=2),
                     devices=jax.devices()[:8])
    model, cfg = _tiny_model(seq_mesh=mesh, attn_impl="ring")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    state = jax.device_put(state, state_shardings(state, mesh))
    qkv = state.params["params"]["block_0"]["attn"]["qkv"]["kernel"]
    assert "fsdp" in str(qkv.sharding.spec)
    task = TrainTask(grid_size=3, block_size=16, patch_size=8,
                     shared_perm=False)
    step = make_train_step(model, create_diffusion(""), opt, task,
                           jnp.asarray(grid_code(8, 3)), donate=False)
    b = jax.device_put(jax.random.normal(jax.random.key(1), (8, 48, 48, 3)),
                       batch_sharding(mesh, 4))
    state2, m = step(state, b, jax.random.key(2))
    assert jnp.isfinite(m["loss"])
    qkv2 = state2.params["params"]["block_0"]["attn"]["qkv"]["kernel"]
    assert "fsdp" in str(qkv2.sharding.spec)


def test_train_step_loss_parity_dp_vs_dpxsp():
    """One train step on (data=8) vs (data=4, seq=2): same loss, same
    post-step param sample — context parallelism must not change the
    math, only the layout."""
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
    from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
    from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    diffusion = create_diffusion("")
    task = TrainTask(grid_size=3, block_size=16, patch_size=8,
                     shared_perm=False)
    code = jnp.asarray(grid_code(8, 3))
    batch = jax.random.normal(jax.random.key(1), (8, 48, 48, 3))

    losses, samples = [], []
    for spec in (MeshSpec(data=8), MeshSpec(data=4, seq=2)):
        mesh = make_mesh(spec, devices=jax.devices()[:8])
        seq = mesh if "seq" in mesh.axis_names else None
        model, cfg = _tiny_model(seq_mesh=seq,
                                 attn_impl="ring" if seq else "xla")
        opt = make_optimizer(lr=1e-3)
        state = create_train_state(model, cfg, jax.random.key(0), opt)
        state = jax.device_put(state, state_shardings(state, mesh))
        step = make_train_step(model, diffusion, opt, task, code,
                               donate=False)
        b = jax.device_put(batch, batch_sharding(mesh, 4))
        state2, m = step(state, b, jax.random.key(2))
        losses.append(float(m["loss"]))
        samples.append(np.asarray(
            state2.params["params"]["block_0"]["attn"]["qkv"]["kernel"]))
    assert abs(losses[0] - losses[1]) < 1e-5, losses
    np.testing.assert_allclose(samples[1], samples[0], atol=1e-5, rtol=1e-4)
