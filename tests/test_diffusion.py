"""Parity of q/p processes and the full faithful solve vs recorded reference."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion


def _toy_model_fn(goldens):
    A = jnp.asarray(goldens["toy_A"])
    b = jnp.asarray(goldens["toy_b"])

    def model_fn(condition, t_orig, x):
        f = 1.0 + t_orig.astype(jnp.float32).reshape(-1, 1, 1) / 1000.0
        return condition, jnp.einsum("bnd,de->bne", x, A) * f + b

    return model_fn


def test_q_sample_matches_reference(goldens):
    d = create_diffusion("250")
    out = d.q_sample(jnp.asarray(goldens["io_x0"]),
                     jnp.asarray(goldens["io_t"]),
                     jnp.asarray(goldens["io_noise"]))
    np.testing.assert_allclose(np.asarray(out), goldens["io_q_sample"],
                               rtol=1e-5, atol=1e-6)


def test_q_posterior_matches_reference(goldens):
    d = create_diffusion("250")
    mean, var, logvar = d.q_posterior_mean_variance(
        jnp.asarray(goldens["io_x0"]), jnp.asarray(goldens["io_xt"]),
        jnp.asarray(goldens["io_t"]))
    np.testing.assert_allclose(np.asarray(mean), goldens["io_post_mean"],
                               rtol=1e-5, atol=1e-6)
    ref_var = goldens["io_post_var"]
    ref_logvar = goldens["io_post_logvar"]
    np.testing.assert_allclose(np.broadcast_to(np.asarray(var), ref_var.shape),
                               ref_var, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(logvar), ref_logvar.shape),
        ref_logvar, rtol=1e-5, atol=1e-5)


def test_faithful_solve_matches_reference(goldens):
    """End-to-end 250-step faithful loop == recorded reference output."""
    d = create_diffusion("250")
    model_fn = _toy_model_fn(goldens)
    cond = jnp.asarray(goldens["toy_cond"])  # layout irrelevant for toy model
    noise = jnp.asarray(goldens["toy_noise"])
    out = jax.jit(
        lambda n, r: d.p_sample_loop(model_fn, cond, n, r, mode="faithful")
    )(noise, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), goldens["toy_solve"],
                               rtol=1e-4, atol=1e-5)


def test_faithful_solve_clip_matches_reference(goldens):
    d = create_diffusion("250")
    model_fn = _toy_model_fn(goldens)
    out = d.p_sample_loop(model_fn, jnp.asarray(goldens["toy_cond"]),
                          jnp.asarray(goldens["toy_noise"]),
                          jax.random.key(1), mode="faithful",
                          clip_denoised=True)
    np.testing.assert_allclose(np.asarray(out), goldens["toy_solve_clip"],
                               rtol=1e-4, atol=1e-5)


def test_fast_mode_equals_faithful(goldens):
    """solve_t0 must be bit-equal to the 250-step faithful loop."""
    d = create_diffusion("250")
    model_fn = _toy_model_fn(goldens)
    cond = jnp.asarray(goldens["toy_cond"])
    noise = jnp.asarray(goldens["toy_noise"])
    slow = d.p_sample_loop(model_fn, cond, noise, jax.random.key(2), mode="faithful")
    fast = d.p_sample_loop(model_fn, cond, noise, jax.random.key(3), mode="fast")
    np.testing.assert_allclose(np.asarray(slow), np.asarray(fast),
                               rtol=1e-5, atol=1e-6)


def test_ddim_matches_independent_reference(goldens):
    d = create_diffusion("ddim25")
    model_fn = _toy_model_fn(goldens)
    out = d.ddim_sample_loop(model_fn, jnp.asarray(goldens["toy_cond"]),
                             jnp.asarray(goldens["toy_noise"]),
                             jax.random.key(0), eta=0.0)
    np.testing.assert_allclose(np.asarray(out), goldens["toy_ddim25"],
                               rtol=1e-4, atol=1e-5)


def test_iterative_mode_runs_and_differs():
    """Corrected chain must run and (generically) differ from faithful."""
    d = create_diffusion("25")

    def model_fn(c, t, x):
        return c, 0.5 * x

    noise = jax.random.normal(jax.random.key(0), (2, 9, 8))
    cond = jnp.zeros((2, 3, 3, 3))
    faith = d.p_sample_loop(model_fn, cond, noise, jax.random.key(1), mode="faithful")
    iter_ = d.p_sample_loop(model_fn, cond, noise, jax.random.key(1), mode="iterative")
    assert not np.allclose(np.asarray(faith), np.asarray(iter_))


def test_training_losses_matches_reference_golden(goldens):
    """Full composite parity: jigsaw shuffle + unpermuted masks + q-sampling
    + clean-visible composite + dual MSE vs the reference's training_losses,
    with identical injected randomness (recorded via monkeypatched
    np.random/torch.randn in the golden script)."""
    d = create_diffusion("")
    # reference inputs are NCHW; ours NHWC
    x = jnp.asarray(goldens["tl_x_start"]).transpose(0, 2, 3, 1)
    noise_x = jnp.asarray(goldens["tl_noise_x"]).transpose(0, 2, 3, 1)
    noise_c = jnp.asarray(goldens["tl_noise_c"])
    code = jnp.asarray(goldens["tl_code"])
    t = jnp.asarray(goldens["tl_t"], dtype=jnp.int32)
    b = x.shape[0]
    perm = jnp.broadcast_to(jnp.asarray(goldens["tl_perm"]), (b, 9))
    piece_mask = np.ones((b, 9), np.float32)
    for i, row in enumerate(goldens["tl_mask_lists"]):
        for idx in row:
            if idx >= 0:
                piece_mask[i, idx] = 0.0

    def lin_model(x_t, t_orig, code_t):
        return 0.5 * x_t, 0.25 * code_t

    out = d.training_losses(
        lin_model, x, t, code, jax.random.key(0),
        block_size=16, patch_size=8, add_mask=True, grid_size=3,
        _inject={"indices": perm, "piece_mask": jnp.asarray(piece_mask),
                 "noise_x": noise_x, "noise_c": noise_c})
    np.testing.assert_allclose(np.asarray(out["loss"]), goldens["tl_loss"],
                               rtol=1e-5, atol=1e-6)


def test_training_losses_shapes_and_zero_loss_oracle():
    """An oracle model that returns the targets must give ~zero loss."""
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    d = create_diffusion("")  # full 1000-step chain, as training does
    grid, block, patch = 3, 16, 8
    code = jnp.asarray(grid_code(8, grid))
    b = 4
    x = jax.random.normal(jax.random.key(0), (b, grid * block, grid * block, 3))
    t = jnp.array([0, 10, 500, 999])

    captured = {}

    def oracle(x_t, t_orig, code_t):
        captured["x_t"] = x_t
        return x_t, code_t  # placeholder; replaced below

    # First run to capture shapes (loss won't be zero).
    out = d.training_losses(oracle, x, t, code, jax.random.key(1),
                            block_size=block, patch_size=patch,
                            add_mask=True, grid_size=grid)
    assert out["loss"].shape == (b,)
    assert out["indices"].shape == (b, grid * grid)
    assert captured["x_t"].shape == x.shape

    # With mean_type start_x the targets are (x_shuffled, code_tokens).
    # Build an oracle from the returned indices: it knows the shuffled
    # truth, so loss must be ~0.
    from jpdvt_mt_ntnu_tpu.ops import jigsaw

    indices = out["indices"]
    x_shuf = jigsaw.scramble(x, indices[0], grid)  # shared perm
    code_tok = jigsaw.piece_code_to_tokens(code[indices], grid, block // patch)

    def true_oracle(x_t, t_orig, code_t):
        return x_shuf, code_tok

    out2 = d.training_losses(true_oracle, x, t, code, jax.random.key(1),
                             block_size=block, patch_size=patch,
                             add_mask=True, grid_size=grid)
    np.testing.assert_allclose(np.asarray(out2["loss"]), 0.0, atol=1e-9)


def test_training_losses_per_sample_perm():
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    d = create_diffusion("")
    code = jnp.asarray(grid_code(8, 3))
    x = jax.random.normal(jax.random.key(0), (3, 48, 48, 3))
    t = jnp.array([1, 2, 3])

    def m(x_t, t_orig, c_t):
        return jnp.zeros_like(x_t), jnp.zeros_like(c_t)

    out = d.training_losses(m, x, t, code, jax.random.key(4),
                            block_size=16, patch_size=8, grid_size=3,
                            shared_perm=False)
    idx = np.asarray(out["indices"])
    assert not (idx[0] == idx[1]).all() or not (idx[1] == idx[2]).all()
    # each row is a permutation
    for row in idx:
        assert sorted(row.tolist()) == list(range(9))
