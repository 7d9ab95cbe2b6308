"""16x16 puzzle path — 256 pieces, 16x the reference's piece-count ceiling.

The geometry the 256-piece run uses: JPDVT@256 -> patch 16, 16 tokens per
side, grid 16 -> sub = 1 (every model token is its own puzzle piece, the
flagship's 12x12 pattern at 256 tokens). The reference supports 3x3 and
4x4 only (train_JPDVT.py / train_JPDVT_4x4.py); every op here is
grid-parameterized, so 16x16 needs zero special cases — these tests pin
that, end to end, on a scaled-down geometry.
"""

import jax
import jax.numpy as jnp

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops import jigsaw
from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

from test_grid8 import _Oracle8, _slot_images


import pytest

def test_grid16_sub1_oracle_perfect():
    # 64px, patch 4 -> 16 tokens/side; grid 16 -> sub = 1 (the 256-piece
    # JPDVT@256 geometry, scaled down)
    _, cfg = create_model("JPDVT", input_size=64, depth=1, hidden_size=32,
                          num_heads=2, patch_size=4, attn_impl="xla")
    assert cfg.input_size // (cfg.patch_size * 16) == 1
    solver = PuzzleSolver(_Oracle8(cfg, grid=16), cfg, create_diffusion("5"),
                          grid_size=16, mode="faithful")
    x = _slot_images(2, 64, 16)
    res = solver.evaluate(None, x, jax.random.key(0))
    assert res.puzzle_accuracy == 1.0
    assert res.pred.shape == (2, 256)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_grid16_train_step_runs():
    model, cfg = create_model("JPDVT", input_size=64, depth=1,
                              hidden_size=32, num_heads=2, patch_size=4,
                              attn_impl="xla")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    task = TrainTask(grid_size=16, block_size=4, patch_size=4,
                     shared_perm=False)
    step = make_train_step(model, create_diffusion(""), opt, task,
                           jnp.asarray(grid_code(8, 16)), donate=False)
    x = jax.random.normal(jax.random.key(1), (4, 64, 64, 3))
    state2, m = step(state, x, jax.random.key(2))
    assert jnp.isfinite(m["loss"])
    assert int(state2.step) == 1
