"""20x20 and 24x24 puzzle paths — 400 and 576 pieces.

The production geometries of the round-3 grid-ladder top: JPDVT@320 ->
patch 16, 20 tokens/side, grid 20 -> sub = 1; and JPDVT@384 -> 24
tokens/side, grid 24 -> sub = 1. At 576 tokens the 24x24 geometry is the
first production shape inside the Pallas whole-row attention window
(ops/attention.default_impl routes [512, 1296] to 'pallas'), so the
custom kernels carry the real train/eval path there. The reference
supports 3x3 and 4x4 only (train_JPDVT.py / train_JPDVT_4x4.py); every
op here is grid-parameterized, so these need zero special cases — pinned
end to end on scaled-down geometry.
"""

import jax
import jax.numpy as jnp

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops.attention import default_impl
from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

from test_grid8 import _Oracle8, _slot_images


import pytest

def _oracle_roundtrip(grid, size, patch):
    _, cfg = create_model("JPDVT", input_size=size, depth=1, hidden_size=32,
                          num_heads=2, patch_size=patch, attn_impl="xla")
    assert cfg.input_size // (cfg.patch_size * grid) == 1  # sub = 1
    solver = PuzzleSolver(_Oracle8(cfg, grid=grid), cfg,
                          create_diffusion("5"), grid_size=grid,
                          mode="faithful")
    res = solver.evaluate(None, _slot_images(2, size, grid),
                          jax.random.key(0))
    assert res.puzzle_accuracy == 1.0
    assert res.pred.shape == (2, grid * grid)


def test_grid20_sub1_oracle_perfect():
    # 80px, patch 4 -> 20 tokens/side (JPDVT@320 grid 20, scaled down)
    _oracle_roundtrip(20, 80, 4)


def test_grid24_sub1_oracle_perfect():
    # 96px, patch 4 -> 24 tokens/side (JPDVT@384 grid 24, scaled down)
    _oracle_roundtrip(24, 96, 4)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_grid24_train_step_runs():
    model, cfg = create_model("JPDVT", input_size=96, depth=1,
                              hidden_size=32, num_heads=2, patch_size=4,
                              attn_impl="xla")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    task = TrainTask(grid_size=24, block_size=4, patch_size=4,
                     shared_perm=False)
    step = make_train_step(model, create_diffusion(""), opt, task,
                           jnp.asarray(grid_code(8, 24)), donate=False)
    x = jax.random.normal(jax.random.key(1), (2, 96, 96, 3))
    state2, m = step(state, x, jax.random.key(2))
    assert jnp.isfinite(m["loss"])
    assert int(state2.step) == 1


def test_production_24x24_geometry_routes_to_pallas():
    # JPDVT@384 -> (384/16)^2 = 576 tokens: inside the measured Pallas
    # whole-row window [512, 1296] on TPU; XLA elsewhere (incl. this CPU
    # test backend, where default_impl must still return 'xla').
    _, cfg = create_model("JPDVT", input_size=384)
    assert cfg.num_tokens == 576
    assert default_impl(576) == ("pallas" if jax.default_backend() == "tpu"
                                 else "xla")
