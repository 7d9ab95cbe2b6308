"""Sequence parallelism on the EVAL path: a ring-attention solver matches
the plain solver prediction-for-prediction.

Why this matters: for serving one enormous puzzle (e.g. a full-resolution
textile scan at thousands of tokens), batch data parallelism has nothing
to shard — context parallelism is the only axis that engages multiple
chips on a single image. The PuzzleSolver is model-agnostic, so the same
jitted scramble->solve->assign program runs with ring attention inside;
this pins that the predictions are identical to the single-device solver
on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.parallel import MeshSpec, make_mesh


def test_solver_predictions_identical_ring_vs_xla():
    mesh = make_mesh(MeshSpec(data=4, seq=2), devices=jax.devices()[:8])
    kw = dict(input_size=48, depth=2, hidden_size=64, num_heads=4,
              patch_size=8)  # 36 tokens -> 18 per 'seq' shard
    model_x, cfg = create_model("JPDVT", attn_impl="xla", **kw)
    model_r, _ = create_model("JPDVT", attn_impl="ring", seq_mesh=mesh, **kw)
    x = jax.random.normal(jax.random.key(1), (4, 48, 48, 3))
    params = model_x.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, cfg.num_tokens, 8)))
    diffusion = create_diffusion("5")
    res_x = PuzzleSolver(model_x, cfg, diffusion, grid_size=3,
                         mode="faithful").evaluate(params, x,
                                                   jax.random.key(2))
    res_r = PuzzleSolver(model_r, cfg, diffusion, grid_size=3,
                         mode="faithful").evaluate(params, x,
                                                   jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(res_r.pred),
                                  np.asarray(res_x.pred))
    assert res_r.puzzle_accuracy == res_x.puzzle_accuracy
