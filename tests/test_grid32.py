"""32x32 (and 40x40) puzzle paths — 1,024 and 1,600 pieces.

Round-4 ladder extension beyond 24x24. JPDVT@512 -> patch 16, 32
tokens/side, grid 32 -> sub = 1: 1,024 pieces, 64x the reference's 4x4
piece-count ceiling (train_JPDVT_4x4.py is its largest trainer). At
1,024 tokens the geometry sits at the TOP of the measured whole-row
Pallas window [512, 1296]; the flash-tiled kernels
(ops/flash_attention.py) take over only >1296 tokens — the first such
production shape is JPDVT@640 grid 40 (1,600 tokens). Both routings are
pinned here; the ops are grid-parameterized so the paths need zero
special cases (scaled-down oracle + train-step smokes).
"""

import jax
import jax.numpy as jnp
import pytest

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops.attention import default_impl
from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

from test_grid8 import _Oracle8, _slot_images
from test_grid20_24 import _oracle_roundtrip


def test_grid32_sub1_oracle_perfect():
    # 128px, patch 4 -> 32 tokens/side (JPDVT@512 grid 32, scaled down)
    _oracle_roundtrip(32, 128, 4)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_grid40_sub1_oracle_perfect():
    # 160px, patch 4 -> 40 tokens/side (JPDVT@640 grid 40, scaled down)
    _oracle_roundtrip(40, 160, 4)


@pytest.mark.slow  # fast tier: pytest -m 'not slow'
def test_grid32_train_step_runs():
    model, cfg = create_model("JPDVT", input_size=128, depth=1,
                              hidden_size=32, num_heads=2, patch_size=4,
                              attn_impl="xla")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    task = TrainTask(grid_size=32, block_size=4, patch_size=4,
                     shared_perm=False)
    step = make_train_step(model, create_diffusion(""), opt, task,
                           jnp.asarray(grid_code(8, 32)), donate=False)
    x = jax.random.normal(jax.random.key(1), (2, 128, 128, 3))
    state2, m = step(state, x, jax.random.key(2))
    assert jnp.isfinite(m["loss"])
    assert int(state2.step) == 1


def test_production_32x32_geometry_routes_to_whole_row():
    # JPDVT@512 -> (512/16)^2 = 1024 tokens: still inside the whole-row
    # window [512, 1296] (the round-3 fwd+bwd wins at 1024 were measured
    # on the whole-row kernels, PERF.md); 'xla' on the CPU test backend.
    _, cfg = create_model("JPDVT", input_size=512)
    assert cfg.num_tokens == 1024
    assert default_impl(1024) == ("pallas"
                                  if jax.default_backend() == "tpu"
                                  else "xla")


def test_production_40x40_geometry_routes_to_flash():
    # JPDVT@640 -> (640/16)^2 = 1600 tokens: beyond the whole-row VMEM
    # window — the first production shape on the flash-tiled route
    # (ops/flash_attention.py; 4.1x vs XLA fwd+bwd at 4096 in bench).
    _, cfg = create_model("JPDVT", input_size=640)
    assert cfg.num_tokens == 1600
    assert default_impl(1600) == ("flash"
                                  if jax.default_backend() == "tpu"
                                  else "xla")
