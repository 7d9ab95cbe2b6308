"""Condition-embedding hoisting: precomputed tokens == inline embedding."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.models.dit import embed_condition


def test_precomputed_tokens_match_inline():
    model, cfg = create_model("JPDVT", input_size=48, depth=2, hidden_size=64,
                              num_heads=4, attn_impl="xla")
    x = jax.random.normal(jax.random.key(1), (2, 48, 48, 3))
    code = jax.random.normal(jax.random.key(2), (2, cfg.num_tokens, 8))
    t = jnp.array([3, 700])
    params = model.init(jax.random.key(0), x, t, code)
    img_a, code_a = model.apply(params, x, t, code)
    tokens = embed_condition(params, x, cfg)
    img_b, code_b = model.apply(params, tokens, t, code, x_is_tokens=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(code_a), np.asarray(code_b),
                               rtol=1e-5, atol=1e-6)


def test_solver_hoisting_equals_reference_solve():
    """Whole solve through the solver (hoisted) == manual un-hoisted loop."""
    from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
    from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver

    model, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                              num_heads=2, attn_impl="xla")
    x = jax.random.normal(jax.random.key(1), (2, 48, 48, 3))
    params = model.init(jax.random.key(0), x, jnp.array([0, 0]),
                        jnp.zeros((2, 9, 8)))
    d = create_diffusion("5")
    solver = PuzzleSolver(model, cfg, d, grid_size=3, mode="faithful")
    pred = solver.solve(params, x)

    noise = jnp.broadcast_to(solver.noise_template, (2, 9, 8))
    final = d.p_sample_loop(
        lambda c, t, cc: model.apply(params, c, t, cc), x, noise,
        solver._rng, mode="faithful", clip_denoised=False)
    from jpdvt_mt_ntnu_tpu.ops import assignment, jigsaw

    pieces = jigsaw.tokens_to_piece_code(final, 3, 1)
    ref = assignment.greedy_permutation(
        assignment.manhattan_distances(pieces, solver.canon))
    np.testing.assert_array_equal(pred, np.asarray(ref))