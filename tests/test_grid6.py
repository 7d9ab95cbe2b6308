"""6x6 puzzle path — beyond the reference's largest grid (4x4).

The geometry the flagship runs at 192px: grid 6 -> 32px pieces, sub = 2
(2x2 model tokens pooled per piece). The reference supports 3x3 and 4x4
only (train_JPDVT.py / train_JPDVT_4x4.py); every op here is
grid-parameterized, so 6x6 needs zero special cases — these tests pin
that, end to end (oracle solve + training losses + real train step).
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


import pytest

class _Oracle6:
    """Model stub that reads the slot id painted into each piece and emits
    that slot's canonical code for every one of the piece's sub-tokens."""

    def __init__(self, cfg, grid=6):
        self.cfg = cfg
        self.grid = grid
        self.sub = cfg.input_size // (cfg.patch_size * grid)
        self.canon = jnp.asarray(grid_code(cfg.code_dim, grid))

    def apply(self, params, condition, t, code):
        pieces = jigsaw.to_pieces(condition, self.grid)
        slot_ids = pieces[:, :, 0, 0, 0].astype(jnp.int32)
        toks = jigsaw.piece_code_to_tokens(self.canon[slot_ids], self.grid,
                                           self.sub)
        return condition, toks


def _slot_images(b, size, grid):
    p = grid * grid
    ids = jnp.arange(p, dtype=jnp.float32).reshape(1, p, 1, 1, 1)
    px = size // grid
    return jigsaw.from_pieces(
        jnp.broadcast_to(ids, (b, p, px, px, 3)), grid)


def test_grid6_sub2_oracle_perfect():
    # 96px, patch 8 -> 12 tokens/side; grid 6 -> sub = 2 (the flagship's
    # 192px/patch-16 6x6 geometry, scaled down)
    _, cfg = create_model("JPDVT", input_size=96, depth=1, hidden_size=32,
                          num_heads=2, patch_size=8, attn_impl="xla")
    assert cfg.input_size // (cfg.patch_size * 6) == 2
    solver = PuzzleSolver(_Oracle6(cfg), cfg, create_diffusion("5"),
                          grid_size=6, mode="faithful")
    x = _slot_images(2, 96, 6)
    res = solver.evaluate(None, x, jax.random.key(0))
    assert res.puzzle_accuracy == 1.0
    assert res.pred.shape == (2, 36)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_grid6_train_step_runs_and_learns_shapes():
    model, cfg = create_model("JPDVT", input_size=96, depth=1,
                              hidden_size=32, num_heads=2, patch_size=8,
                              attn_impl="xla")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    task = TrainTask(grid_size=6, block_size=16, patch_size=8,
                     shared_perm=False)
    step = make_train_step(model, create_diffusion(""), opt, task,
                           jnp.asarray(grid_code(8, 6)), donate=False)
    x = jax.random.normal(jax.random.key(1), (4, 96, 96, 3))
    state2, m = step(state, x, jax.random.key(2))
    assert jnp.isfinite(m["loss"])
    assert int(state2.step) == 1
