"""4x4 puzzle path (the reference's JPDVT-T/256 configuration, scaled down).

Exercises sub=1 (one model token per piece — the JPDVT-T geometry where
256/(64*4) = 1, inference_4x4.py:296) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops import jigsaw
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code


class _Oracle4:
    def __init__(self, cfg, grid=4):
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


def test_grid4_sub1_oracle_perfect():
    # 32px, patch 8 -> 4 tokens/side; grid 4 -> sub = 1 (JPDVT-T geometry)
    _, cfg = create_model("JPDVT", input_size=32, depth=1, hidden_size=32,
                          num_heads=2, patch_size=8, attn_impl="xla")
    assert cfg.input_size // (cfg.patch_size * 4) == 1
    solver = PuzzleSolver(_Oracle4(cfg), cfg, create_diffusion("5"),
                          grid_size=4, mode="faithful")
    x = _slot_images(3, 32, 4)
    res = solver.evaluate(None, x, jax.random.key(0))
    assert res.puzzle_accuracy == 1.0
    assert res.pred.shape == (3, 16)


def test_grid4_training_losses_shapes():
    d = create_diffusion("")
    code = jnp.asarray(grid_code(8, 4))
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))

    def m(x_t, t, c_t):
        return jnp.zeros_like(x_t), jnp.zeros_like(c_t)

    out = d.training_losses(m, x, jnp.array([5, 500]), code,
                            jax.random.key(1), block_size=8, patch_size=8,
                            grid_size=4, add_mask=True)
    assert out["loss"].shape == (2,)
    assert out["indices"].shape == (2, 16)
    # add_mask hides r in {0..3} pieces per sample for grid 4
    hidden = 16 - np.asarray(out["piece_mask"]).sum(-1)
    assert (hidden <= 3).all()


def test_harness_native_decode_real_files(tmp_path):
    """EvalHarness with the native C++ decoder over real PNG files."""
    from PIL import Image

    from jpdvt_mt_ntnu_tpu.eval.harness import EvalHarness
    from jpdvt_mt_ntnu_tpu.ops import native
    from test_solver import _OracleModel

    if not native.available():
        import pytest

        pytest.skip("native library not built")

    # slot-id images as PNGs (values 0..8 scaled to bytes that survive
    # uint8 roundtrip: use 0..8 -> pixel = (id*20+10))
    d = tmp_path / "imgs"
    d.mkdir()
    grid, size = 3, 48
    ids = np.repeat(np.repeat(np.arange(9).reshape(3, 3), 16, 0), 16, 1)
    px = (ids * 20 + 10).astype(np.uint8)
    img = np.stack([px] * 3, -1)
    for i in range(4):
        Image.fromarray(img).save(d / f"im{i}.png")

    _, cfg = create_model("JPDVT", input_size=size, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")

    class OracleFromPixels(_OracleModel):
        def apply(self, params, condition, t, code):
            pieces = jigsaw.to_pieces(condition, self.grid)
            # invert the (id*20+10)/255*2-1 encoding
            vals = (pieces[:, :, 0, 0, 0] + 1) / 2 * 255
            slot_ids = jnp.round((vals - 10) / 20).astype(jnp.int32)
            toks = jigsaw.piece_code_to_tokens(
                self.canon[jnp.clip(slot_ids, 0, 8)], self.grid, self.sub)
            return condition, toks

    solver = PuzzleSolver(OracleFromPixels(cfg, grid), cfg,
                          create_diffusion("3"), grid_size=grid, mode="fast")
    h = EvalHarness(solver, None, logs_dir=str(tmp_path / "logs"),
                    batch_size=2, use_native_decode=True)
    rep = h.run_paths([str(p) for p in sorted(d.iterdir())])
    assert rep.count == 4
    assert rep.puzzle_accuracy == 1.0
