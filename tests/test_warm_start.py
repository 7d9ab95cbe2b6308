"""Cross-grid warm-start: the mechanism behind the 24x24 capstone result.

PERF.md ("24x24: the cold start stalls") records that a grid-20-trained
checkpoint warm-starts grid-24 training directly — possible because the
DiT is geometry-agnostic: the patch embed is a Dense over patch_dim and
the positional tables are computed, not parameters (models/dit.py), so a
checkpoint written at one (image_size, grid) restores into any other
with the SAME patch size. The production trainer relies on this
(run_train.py resume block restores into the freshly built state for the
NEW config); the reference has no equivalent (its torch DiT registers
pos_embed as a buffer sized to one geometry, image_model/models.py).

These tests pin the mechanism so a future config-mismatch guard or a
parameterised pos table cannot silently break it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.train import CheckpointManager, create_train_state
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask, make_train_step
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code


import pytest

def _build(size, grid, seed=0):
    """Tiny JPDVT at (size, grid) with 16px pieces — mirrors the ladder's
    sub=1 geometry where piece size stays fixed as the grid scales."""
    assert size // grid == 16
    model, cfg = create_model("JPDVT", input_size=size, depth=2,
                              hidden_size=64, num_heads=4, attn_impl="xla")
    diff = create_diffusion("")
    opt = make_optimizer(lr=2e-3)
    state = create_train_state(model, cfg, jax.random.key(seed), opt)
    task = TrainTask(grid_size=grid, block_size=16, patch_size=cfg.patch_size,
                     add_mask=False, shared_perm=True)
    code = jnp.asarray(grid_code(8, grid))
    step = make_train_step(model, diff, opt, task, code, donate=False)
    return state, step


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_cross_grid_restore_and_step(tmp_path):
    """A grid-3@48 checkpoint restores into a grid-6@96 state (same 16px
    pieces) and the grid-6 train step runs on it — the exact production
    warm-start path (train.resume with a larger-grid config)."""
    state3, step3 = _build(48, 3)
    x3 = jax.random.normal(jax.random.key(2), (4, 48, 48, 3))
    for _ in range(3):
        state3, _ = step3(state3, x3, jax.random.key(1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state3)
    mgr.wait()

    # Fresh state built for the LARGER geometry; restore must accept the
    # small-grid checkpoint verbatim (identical param tree/shapes).
    state6, step6 = _build(96, 6, seed=7)
    restored = mgr.restore(state6)
    mgr.close()

    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state3.params)[0]))
    # Step counter carries over — PERF.md's "+2.5k steps" accounting.
    assert int(restored.step) == 3

    x6 = jax.random.normal(jax.random.key(3), (2, 96, 96, 3))
    out, metrics = step6(restored, x6, jax.random.key(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(out.step) == 4


def test_param_tree_is_geometry_independent():
    """The property the warm start rests on: same patch size => identical
    param trees across grids/image sizes (pos tables are computed)."""
    s3, _ = _build(48, 3)
    s6, _ = _build(96, 6)
    shapes3 = jax.tree.map(lambda p: p.shape, s3.params)
    shapes6 = jax.tree.map(lambda p: p.shape, s6.params)
    assert shapes3 == shapes6


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_ema_anchor_rearms_warmup():
    """TrainTask.ema_anchor shifts the warmup ramp's origin: a warm-started
    step (state.step = anchor) must use the FAST early decay, not the
    converged ema_decay — the round-3 24x24 rung paid 10-20k steps of EMA
    lag for the lack of this (PERF.md)."""
    model, cfg = create_model("JPDVT", input_size=48, depth=1,
                              hidden_size=32, num_heads=2, attn_impl="xla")
    diff = create_diffusion("")
    opt = make_optimizer(lr=2e-3)
    code = jnp.asarray(grid_code(8, 3))
    x = jax.random.normal(jax.random.key(2), (4, 48, 48, 3))

    task_anchored = TrainTask(grid_size=3, block_size=16,
                              patch_size=cfg.patch_size,
                              ema_warmup=True, ema_anchor=5000)
    task_cold = TrainTask(grid_size=3, block_size=16,
                          patch_size=cfg.patch_size,
                          ema_warmup=True, ema_anchor=0)
    from jpdvt_mt_ntnu_tpu.train.state import TrainState

    base = create_train_state(model, cfg, jax.random.key(0), opt)
    stale = TrainState(step=jnp.asarray(5000, jnp.int32), params=base.params,
                       ema_params=jax.tree.map(jnp.zeros_like, base.params),
                       opt_state=base.opt_state)

    step_a = make_train_step(model, diff, opt, task_anchored, code,
                             donate=False)
    step_c = make_train_step(model, diff, opt, task_cold, code, donate=False)
    out_a, _ = step_a(stale, x, jax.random.key(1))
    out_c, _ = step_c(stale, x, jax.random.key(1))

    # anchored: s=1 -> decay = 2/11, EMA jumps ~82% of the way to params;
    # cold at step 5000: decay = min(.9999, 5002/5011) ~ .9982, EMA barely
    # moves off the stale zeros. Compare global tree norms (individual
    # leaves may be zero-init adaLN params).
    import optax

    def gap(state):
        return float(optax.global_norm(jax.tree.map(
            lambda a, b: a - b, state.ema_params, state.params)))

    scale = float(optax.global_norm(out_a.params))
    assert gap(out_a) < 0.25 * scale, "anchored EMA should track params"
    assert gap(out_c) > 0.9 * scale, "cold-formula EMA should stay stale"


def test_mismatched_patch_size_fails_loudly(tmp_path):
    """A checkpoint whose patch-embed width differs (different piece size)
    must fail on restore, not silently produce garbage.

    The mismatched model keeps hidden_size=64 and every other hyperparam
    identical to ``_build``'s and changes ONLY patch_size (16 -> 12), so
    the patch-embed Dense (patch_dim x hidden) is the sole differing
    shape — the restore failure can come from nothing else."""
    import pytest

    state3, step3 = _build(48, 3)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state3)
    mgr.wait()

    # 12px patches -> patch_dim 12*12*3=432 vs 16*16*3=768: only the
    # patch-embed Dense kernel shape differs from the checkpoint's tree.
    model, cfg = create_model("JPDVT", input_size=48, depth=2,
                              hidden_size=64, num_heads=4, patch_size=12,
                              attn_impl="xla")
    assert cfg.patch_size == 12
    opt = make_optimizer(lr=2e-3)
    other = create_train_state(model, cfg, jax.random.key(1), opt)
    with pytest.raises((ValueError, AssertionError, TypeError)):
        restored = mgr.restore(other)
        # Orbax may restore leniently; a shape check must still trip.
        jax.block_until_ready(
            jax.tree.map(lambda a, b: a + b,
                         restored.params, other.params))
    mgr.close()
