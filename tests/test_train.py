"""Training step: loss decreases on a learnable toy task, EMA + sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.parallel import MeshSpec, make_mesh, shard_batch
from jpdvt_mt_ntnu_tpu.train import TrainState, create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code


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
