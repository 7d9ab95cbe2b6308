"""Training step: loss decreases on a learnable toy task, EMA + sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.parallel import MeshSpec, make_mesh, shard_batch
from jpdvt_mt_ntnu_tpu.train import TrainState, create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code


import pytest

def _setup(size=48, depth=2, hidden=64):
    model, cfg = create_model("JPDVT", input_size=size, depth=depth,
                              hidden_size=hidden, num_heads=4, attn_impl="xla")
    diff = create_diffusion("")
    opt = make_optimizer(lr=2e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    task = TrainTask(grid_size=3, block_size=size // 3, patch_size=cfg.patch_size,
                     add_mask=False, shared_perm=True)
    code = jnp.asarray(grid_code(8, 3))
    step = make_train_step(model, diff, opt, task, code, donate=False)
    return model, cfg, diff, state, step


def test_loss_decreases():
    model, cfg, diff, state, step = _setup()
    rng = jax.random.key(1)
    x = jax.random.normal(jax.random.key(2), (8, 48, 48, 3)) * 0.5
    losses = []
    for i in range(30):
        state, m = step(state, x, rng)
        losses.append(float(m["loss"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses


def test_ema_tracks_params():
    model, cfg, diff, state, step = _setup(depth=1)
    x = jax.random.normal(jax.random.key(2), (4, 48, 48, 3))
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, x, jax.random.key(1))
    ema1 = jax.tree.leaves(state.ema_params)[0]
    p1 = jax.tree.leaves(state.params)[0]
    expect = 0.9999 * p0 + 0.0001 * p1
    np.testing.assert_allclose(np.asarray(ema1), np.asarray(expect),
                               rtol=1e-5, atol=1e-7)


def test_ema_warmup_ramps_decay():
    """ema_warmup: effective decay is min(.9999, (1+s)/(10+s)) — at step 1
    that is 2/11, so the EMA moves ~1800x faster than the fixed schedule."""
    model, cfg = create_model("JPDVT", input_size=48, depth=1,
                              hidden_size=64, num_heads=4, attn_impl="xla")
    diff = create_diffusion("")
    opt = make_optimizer(lr=2e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    task = TrainTask(grid_size=3, block_size=16, patch_size=cfg.patch_size,
                     ema_warmup=True)
    step = make_train_step(model, diff, opt, task, jnp.asarray(grid_code(8, 3)),
                           donate=False)
    x = jax.random.normal(jax.random.key(2), (4, 48, 48, 3))
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, x, jax.random.key(1))
    ema1 = jax.tree.leaves(state.ema_params)[0]
    p1 = jax.tree.leaves(state.params)[0]
    d = 2.0 / 11.0  # min(0.9999, (1+1)/(10+1))
    expect = d * p0 + (1.0 - d) * p1
    np.testing.assert_allclose(np.asarray(ema1), np.asarray(expect),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_train_step_sharded_matches_unsharded():
    model, cfg, diff, state, step = _setup(depth=1)
    x = jax.random.normal(jax.random.key(5), (8, 48, 48, 3))
    s_ref, m_ref = step(state, x, jax.random.key(9))

    mesh = make_mesh(MeshSpec(data=8, model=1))
    xs = shard_batch({"x": x}, mesh)["x"]
    s_sh, m_sh = step(state, xs, jax.random.key(9))
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_sh.params)[0]),
        np.asarray(jax.tree.leaves(s_ref.params)[0]), rtol=1e-4, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from jpdvt_mt_ntnu_tpu.train import CheckpointManager

    model, cfg, diff, state, step = _setup(depth=1)
    x = jax.random.normal(jax.random.key(2), (4, 48, 48, 3))
    state, _ = step(state, x, jax.random.key(1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, metadata={"model": "JPDVT", "note": "test"})
    mgr.wait()
    assert mgr.latest_step() == 1

    opt = make_optimizer(lr=2e-3)
    fresh = create_train_state(model, cfg, jax.random.key(7), opt)
    restored = mgr.restore(fresh)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    assert int(restored.step) == 1
    assert mgr.metadata()["model"] == "JPDVT"
    mgr.close()


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_fused_adamw_matches_optax():
    """The single-pass fused AdamW+EMA (state.fused_adamw_ema) must track
    the optax chain step-for-step: params, EMA, moments and count."""
    from jpdvt_mt_ntnu_tpu.train.state import make_optimizer as mk

    model, cfg, diff, state_a, step_a = _setup()
    opt = mk(lr=2e-3)
    task = TrainTask(grid_size=3, block_size=16, patch_size=cfg.patch_size,
                     add_mask=False, shared_perm=True)
    code = jnp.asarray(grid_code(8, 3))
    step_b = make_train_step(model, diff, opt, task, code, donate=False,
                             fused_adamw=dict(lr=2e-3, weight_decay=0.0))
    state_b = create_train_state(model, cfg, jax.random.key(0), opt)
    x = jax.random.normal(jax.random.key(2), (8, 48, 48, 3)) * 0.5
    rng = jax.random.key(1)
    for _ in range(3):
        state_a, ma = step_a(state_a, x, rng)
        state_b, mb = step_b(state_b, x, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    assert int(state_b.opt_state[0].count) == 3
    for name, ta, tb in (
            ("params", state_a.params, state_b.params),
            ("ema", state_a.ema_params, state_b.ema_params),
            ("mu", state_a.opt_state[0].mu, state_b.opt_state[0].mu),
            ("nu", state_a.opt_state[0].nu, state_b.opt_state[0].nu)):
        for la, lb in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=1e-7, err_msg=name)


def test_fused_adamw_with_weight_decay_matches_optax():
    from jpdvt_mt_ntnu_tpu.train.state import fused_adamw_ema

    params = {"w": jnp.arange(6.0).reshape(2, 3) / 7.0, "b": jnp.ones((3,))}
    grads = {"w": jnp.full((2, 3), 0.3), "b": jnp.array([0.1, -0.2, 0.5])}
    ema = jax.tree.map(jnp.copy, params)
    opt = optax.adamw(3e-3, weight_decay=0.01)
    opt_state = opt.init(params)
    p2, e2, s2 = params, ema, opt_state
    for _ in range(4):
        p2, e2, s2 = fused_adamw_ema(p2, grads, e2, s2, lr=3e-3,
                                     weight_decay=0.01, ema_decay=0.999)
    pr, sr = params, opt_state
    er = ema
    for _ in range(4):
        up, sr = opt.update(grads, sr, pr)
        pr = optax.apply_updates(pr, up)
        er = optax.incremental_update(pr, er, 0.001)
    for got, want in ((p2, pr), (e2, er), (s2[0].mu, sr[0].mu),
                      (s2[0].nu, sr[0].nu)):
        for la, lb in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-8)
