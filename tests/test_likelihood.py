"""Likelihood utils, working VLB, timestep samplers, profiling."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.core.likelihood import (
    calc_bpd_loop,
    discretized_gaussian_log_likelihood,
    normal_kl,
    prior_bpd,
    vb_terms_bpd,
)
from jpdvt_mt_ntnu_tpu.core.timestep_sampler import (
    LossSecondMomentResampler,
    UniformSampler,
)


def test_normal_kl_zero_for_identical():
    m = jnp.array([0.3, -1.0])
    lv = jnp.array([0.1, -0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0,
                               atol=1e-7)


def test_normal_kl_standard_formula():
    # KL(N(1, 1) || N(0, 1)) = 0.5
    out = float(normal_kl(jnp.array(1.0), jnp.array(0.0),
                          jnp.array(0.0), jnp.array(0.0)))
    assert abs(out - 0.5) < 1e-6


def test_discretized_ll_peaks_at_mean():
    x = jnp.array([0.0, 0.5])
    good = discretized_gaussian_log_likelihood(
        x, means=x, log_scales=jnp.full_like(x, -3.0))
    bad = discretized_gaussian_log_likelihood(
        x, means=x + 0.5, log_scales=jnp.full_like(x, -3.0))
    assert (np.asarray(good) > np.asarray(bad)).all()


def _oracle_diffusion():
    d = create_diffusion("10")

    def model_fn(cond, t, x):
        return cond, x * 0.0  # predicts x0 = 0

    return d, model_fn


def test_vb_terms_and_bpd_loop_run():
    d, model_fn = _oracle_diffusion()
    x0 = jax.random.normal(jax.random.key(0), (2, 9, 8)) * 0.1
    xt = jax.random.normal(jax.random.key(1), (2, 9, 8))
    t = jnp.array([0, 5])
    out = vb_terms_bpd(d, model_fn, None, x0, xt, t)
    assert out["output"].shape == (2,)
    assert np.isfinite(np.asarray(out["output"])).all()

    full = calc_bpd_loop(d, model_fn, None, x0, jax.random.key(2))
    assert full["vb"].shape == (2, 10)
    assert full["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(full["total_bpd"])).all()
    # prior term is tiny for small x0
    assert np.asarray(prior_bpd(d, x0 * 0)).max() < 1e-6


def test_vb_prefers_correct_model():
    """A model predicting the true x0 must get a lower bound than one
    predicting garbage."""
    d = create_diffusion("10")
    x0 = jax.random.normal(jax.random.key(0), (4, 9, 8))

    def good(cond, t, x):
        return cond, jnp.broadcast_to(x0, x.shape)

    def bad(cond, t, x):
        return cond, -jnp.broadcast_to(x0, x.shape)

    g = calc_bpd_loop(d, good, None, x0, jax.random.key(1))
    b = calc_bpd_loop(d, bad, None, x0, jax.random.key(1))
    assert float(g["total_bpd"].mean()) < float(b["total_bpd"].mean())


def test_uniform_sampler():
    s = UniformSampler(1000)
    t, w = s.sample(jax.random.key(0), 512)
    assert t.shape == (512,) and 0 <= int(t.min()) and int(t.max()) < 1000
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)


def test_loss_aware_resampler_warmup_and_bias():
    s = LossSecondMomentResampler(10, history_per_term=2)
    assert not s._warmed_up()
    np.testing.assert_array_equal(s.weights(), np.ones(10))
    # feed: timestep 3 has 10x the loss of others
    for _ in range(2):
        ts = np.arange(10)
        losses = np.where(ts == 3, 10.0, 1.0)
        s.update_with_losses(ts, losses)
    assert s._warmed_up()
    w = s.weights()
    assert w[3] > w[0] * 5
    t, iw = s.sample(jax.random.key(1), 2000)
    frac3 = float((np.asarray(t) == 3).mean())
    assert frac3 > 0.2  # heavily oversampled vs uniform 0.1
    # importance weights undo the bias: E[w] == 1
    assert abs(float(iw.mean()) - 1.0) < 0.15


def test_measure_and_steptimer():
    from jpdvt_mt_ntnu_tpu.utils.profiling import StepTimer, measure

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    stats = measure(f, x, iters=3)
    assert stats["compile_s"] > 0 and stats["steady_s"] > 0
    assert stats["compile_s"] >= stats["steady_s"]

    t = StepTimer()
    for _ in range(5):
        t.step(fence=f(x))
    assert t.rate() > 0
