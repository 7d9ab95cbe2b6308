"""Accuracy regression on a REAL trained model (committed fixture).

tests/fixtures/tiny_jpdvt_48px.npz holds the EMA weights of a tiny JPDVT
(48px, depth 2, hidden 64, heads 4) trained for 3200 steps on the
position-cue synthetic set with this framework's own training loop (TPU,
t_bias=2.0) — it reached 100% puzzle/patch validation accuracy. These tests
pin that capability: the whole stack (model apply, schedule math, samplers,
recovery) must keep solving puzzles.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.tools.torch_convert import load_npz_params

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_jpdvt_48px.npz")


@pytest.fixture(scope="module")
def setup():
    model, cfg = create_model("JPDVT", input_size=48, depth=2,
                              hidden_size=64, num_heads=4, attn_impl="xla")
    params = jax.tree.map(jnp.asarray, load_npz_params(FIXTURE))
    ds = SyntheticPuzzles(48, n=32, seed=123)  # unseen seeds
    x = jnp.asarray(np.stack([ds[i] for i in range(32)]))
    return model, cfg, params, x


@pytest.mark.parametrize("mode,steps", [
    ("fast", "50"), ("faithful", "10"), ("iterative", "10"), ("ddim", "ddim10"),
])
def test_trained_model_solves(setup, mode, steps):
    model, cfg, params, x = setup
    solver = PuzzleSolver(model, cfg, create_diffusion(steps),
                          grid_size=3, mode=mode)
    res = solver.evaluate(params, x, jax.random.key(0))
    assert res.puzzle_accuracy >= 0.95, (mode, res.puzzle_accuracy)
    assert res.patch_accuracy >= 0.97


def test_trained_model_hungarian(setup):
    model, cfg, params, x = setup
    solver = PuzzleSolver(model, cfg, create_diffusion("50"), grid_size=3,
                          mode="fast", assignment_method="hungarian")
    res = solver.evaluate(params, x, jax.random.key(1))
    assert res.puzzle_accuracy >= 0.95


def test_trained_model_reconstruction_pixel_perfect(setup):
    model, cfg, params, x = setup
    solver = PuzzleSolver(model, cfg, create_diffusion("50"), grid_size=3,
                          mode="fast")
    scr, idx = solver.scramble(x[:8], jax.random.key(2))
    pred = solver.solve(params, scr)
    rec = solver.reconstruct(scr, pred)
    # at >=95% puzzle accuracy most reconstructions equal the original
    exact = [np.allclose(np.asarray(rec[i]), np.asarray(x[i]), atol=1e-5)
             for i in range(8)]
    assert sum(exact) >= 7
