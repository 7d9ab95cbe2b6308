"""Likelihood utilities + a WORKING variational-bound evaluation.

Port of reference image_model/diffusion/diffusion_utils.py (normal_kl :10,
approx cdf :39, continuous/discretized log-likelihoods :47,:62). The
reference's own VLB path is dead code — ``_vb_terms_bpd`` reads keys that
``p_mean_variance`` never returns (gaussian_diffusion.py:721 reads
``out["x_mean"]``; SURVEY.md §7.4) — so this module provides a corrected
bound over the positional-code stream: ``vb_terms_bpd`` and
``calc_bpd_loop`` that actually run, for diagnostics and model comparison.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .diffusion import Diffusion, ModelFn


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), elementwise in nats."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def continuous_gaussian_log_likelihood(x, *, means, log_scales):
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    normalized = centered * inv_stdv
    return jax.scipy.stats.norm.logpdf(normalized) - log_scales


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to 256 uint8 bins; x in
    [-1, 1] (diffusion_utils.py:62-88)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.maximum(cdf_delta, 1e-12))))


def vb_terms_bpd(diffusion: Diffusion, model_fn: ModelFn, condition,
                 x_start, x_t, t, clip_denoised: bool = False) -> dict:
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits, over the code
    stream; decoder NLL (continuous Gaussian) at t=0. Corrected version of
    the reference's broken _vb_terms_bpd."""
    true_mean, _, true_logvar = diffusion.q_posterior_mean_variance(
        x_start, x_t, t)
    mean, _, logvar, pred_xstart = diffusion.p_mean_variance(
        model_fn, condition, x_t, t, clip_denoised)
    kl = mean_flat(normal_kl(true_mean, true_logvar, mean, logvar)) / math.log(2.0)
    decoder_nll = mean_flat(
        -continuous_gaussian_log_likelihood(
            x_start, means=mean, log_scales=0.5 * logvar)) / math.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": pred_xstart}


def prior_bpd(diffusion: Diffusion, x_start) -> jnp.ndarray:
    """KL(q(x_T|x_0) || N(0, I)) in bits/dim (gaussian_diffusion.py:845-859)."""
    b = x_start.shape[0]
    t = jnp.full((b,), diffusion.schedule.T - 1, jnp.int32)
    mean, _, logvar = diffusion.q_mean_variance(x_start, t)
    kl = normal_kl(mean, logvar, 0.0, 0.0)
    return mean_flat(kl) / math.log(2.0)


def calc_bpd_loop(diffusion: Diffusion, model_fn: ModelFn, condition,
                  x_start, rng, clip_denoised: bool = False) -> dict:
    """Full variational bound over all T timesteps as one lax.scan
    (corrected calc_bpd_loop, gaussian_diffusion.py:861-914)."""
    b = x_start.shape[0]
    T = diffusion.schedule.T

    def step(key, t_scalar):
        key, sub = jax.random.split(key)
        t = jnp.full((b,), t_scalar, jnp.int32)
        noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
        x_t = diffusion.q_sample(x_start, t, noise)
        out = vb_terms_bpd(diffusion, model_fn, condition, x_start, x_t, t,
                           clip_denoised)
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = diffusion._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
        mse = mean_flat((eps - noise) ** 2)
        return key, (out["output"], xstart_mse, mse)

    ts = jnp.arange(T - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, rng, ts)
    vb, xstart_mse, mse = (jnp.moveaxis(a, 0, 1) for a in (vb, xstart_mse, mse))
    prior = prior_bpd(diffusion, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
