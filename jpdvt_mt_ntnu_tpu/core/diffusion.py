"""Pure-functional DDPM over positional codes, conditioned on scrambled images.

Re-architecture of the reference's forked improved-diffusion
(reference: image_model/diffusion/gaussian_diffusion.py). The denoised
variable is the per-token positional code; the scrambled image is pure
conditioning (SURVEY.md §0). Everything is a pure function of a
:class:`DiffusionSchedule` pytree — the entire 250-step reverse process is a
single ``jax.lax.scan`` inside one ``jit``, so a full solve is ONE XLA
program with zero per-step Python/host overhead.

Model protocol: ``model_fn(condition_img, t_original, code) ->
(image_out, code_out)`` with original-chain timesteps (the respacing remap of
reference respace.py:124-129 happens in here).

Sampler modes:
- ``"faithful"``   bit-reproduces the reference quirk: every step feeds the
  ORIGINAL noise to the model instead of the running sample
  (gaussian_diffusion.py:522 — SURVEY.md §3.2). The final output equals the
  model's x0-prediction at t=0 from pure noise. This is the parity target.
- ``"fast"``       the mathematically equivalent shortcut to faithful mode:
  one model call at t=0. Identical output, T× fewer FLOPs.
- ``"iterative"``  the corrected DDPM ancestral chain (feeds the running
  sample back).
- ``ddim_sample_loop``  a WORKING DDIM sampler (the reference's is dead code
  with a broken signature, gaussian_diffusion.py:546-553 — SURVEY.md §7.4).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Literal

import jax
import jax.numpy as jnp

from ..ops import jigsaw
from .schedules import DiffusionSchedule, extract, make_schedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                   tuple[jnp.ndarray, jnp.ndarray]]

MeanType = Literal["previous_x", "start_x", "epsilon"]
VarType = Literal["fixed_small", "fixed_large"]


@dataclasses.dataclass(frozen=True)
class Diffusion:
    """A (possibly respaced) Gaussian diffusion over positional codes."""

    schedule: DiffusionSchedule
    mean_type: MeanType = "start_x"
    var_type: VarType = "fixed_small"

    # ---------------------------------------------------------------- q(·)

    def q_mean_variance(self, x_start, t):
        s = self.schedule
        nd = x_start.ndim
        mean = extract(s.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - s.alphas_cumprod, t, nd)
        log_variance = extract(s.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample q(x_t | x_0) (gaussian_diffusion.py:217-232)."""
        s = self.schedule
        nd = x_start.ndim
        return (extract(s.sqrt_alphas_cumprod, t, nd) * x_start
                + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        """q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:234-254)."""
        s = self.schedule
        nd = x_t.ndim
        mean = (extract(s.posterior_mean_coef1, t, nd) * x_start
                + extract(s.posterior_mean_coef2, t, nd) * x_t)
        return (mean, extract(s.posterior_variance, t, nd),
                extract(s.posterior_log_variance_clipped, t, nd))

    # --------------------------------------------------------------- helpers

    def _predict_xstart_from_eps(self, x_t, t, eps):
        s = self.schedule
        nd = x_t.ndim
        return (extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * eps)

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        s = self.schedule
        nd = x_t.ndim
        return ((extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart)
                / extract(s.sqrt_recipm1_alphas_cumprod, t, nd))

    def to_original_t(self, t):
        """Spaced index -> original-chain index for the model's embedding."""
        return self.schedule.timestep_map[t]

    def _pred_xstart(self, model_out, x, t, clip_denoised):
        if self.mean_type == "start_x":
            pred = model_out
        elif self.mean_type == "epsilon":
            pred = self._predict_xstart_from_eps(x, t, model_out)
        else:
            raise NotImplementedError(self.mean_type)
        if clip_denoised:
            pred = jnp.clip(pred, -1.0, 1.0)
        return pred

    # ----------------------------------------------------------------- p(·)

    def p_mean_variance(self, model_fn: ModelFn, condition, x, t,
                        clip_denoised: bool = True):
        """p(x_{t-1} | x_t) for the code stream.

        Calls ``model_fn(condition, t_orig, x)`` and denoises the CODE output
        (the reference keeps the model's second output,
        gaussian_diffusion.py:281). Variance is FIXED_SMALL — the reference
        force-overrides it at this point regardless of construction
        (gaussian_diffusion.py:288).
        """
        s = self.schedule
        nd = x.ndim
        _, code_out = model_fn(condition, self.to_original_t(t), x)
        pred_xstart = self._pred_xstart(code_out, x, t, clip_denoised)
        mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        if self.var_type == "fixed_small":
            variance = extract(s.posterior_variance, t, nd)
            log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        else:
            variance = extract(s.large_variance, t, nd)
            log_variance = extract(s.large_log_variance, t, nd)
        return mean, variance, log_variance, pred_xstart

    def p_sample(self, model_fn: ModelFn, condition, x, t, rng,
                 clip_denoised: bool = True):
        """One ancestral step (gaussian_diffusion.py:388-431)."""
        mean, _, log_variance, pred_xstart = self.p_mean_variance(
            model_fn, condition, x, t, clip_denoised)
        z = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(t.shape + (1,) * (x.ndim - 1))
        sample = mean + nonzero * jnp.exp(0.5 * log_variance) * z
        return sample, pred_xstart

    def p_sample_loop(self, model_fn: ModelFn, condition, noise, rng,
                      mode: str = "faithful", clip_denoised: bool = False):
        """Full reverse process as one ``lax.scan``.

        condition: (B, H, W, C) scrambled images; noise: (B, N, d) initial
        code noise. Returns the final code sample (B, N, d).
        """
        if mode == "fast":
            return self.solve_t0(model_fn, condition, noise, clip_denoised)
        if mode not in ("faithful", "iterative"):
            raise ValueError(f"unknown sampler mode {mode!r}")
        b = noise.shape[0]
        ts = jnp.arange(self.schedule.T - 1, -1, -1)

        def step(carry, t_scalar):
            img, key = carry
            x_in = noise if mode == "faithful" else img
            t = jnp.full((b,), t_scalar, dtype=jnp.int32)
            key, sub = jax.random.split(key)
            sample, _ = self.p_sample(model_fn, condition, x_in, t, sub,
                                      clip_denoised)
            return (sample, key), None

        (final, _), _ = jax.lax.scan(step, (noise, rng), ts)
        return final

    def solve_t0(self, model_fn: ModelFn, condition, noise,
                 clip_denoised: bool = False):
        """Mathematically-equivalent fast path for faithful mode.

        In the reference loop the model input never changes and only the t=0
        posterior mean survives; coef1[0] = 1, coef2[0] = 0, so the final
        sample IS the model's x0-prediction at t=0 from the original noise
        (SURVEY.md §7.3 item 5). One forward pass instead of T.
        """
        b = noise.shape[0]
        t = jnp.zeros((b,), dtype=jnp.int32)
        _, code_out = model_fn(condition, self.to_original_t(t), noise)
        pred = self._pred_xstart(code_out, noise, t, clip_denoised)
        mean, _, _ = self.q_posterior_mean_variance(pred, noise, t)
        return mean

    # ----------------------------------------------------------------- DDIM

    def ddim_sample_loop(self, model_fn: ModelFn, condition, noise, rng,
                         eta: float = 0.0, clip_denoised: bool = False):
        """Corrected, working DDIM sampler (Song et al. eq. 12)."""
        s = self.schedule
        b = noise.shape[0]
        ts = jnp.arange(s.T - 1, -1, -1)

        def step(carry, t_scalar):
            img, key = carry
            t = jnp.full((b,), t_scalar, dtype=jnp.int32)
            nd = img.ndim
            _, code_out = model_fn(condition, self.to_original_t(t), img)
            pred_xstart = self._pred_xstart(code_out, img, t, clip_denoised)
            eps = self._predict_eps_from_xstart(img, t, pred_xstart)
            a_bar = extract(s.alphas_cumprod, t, nd)
            a_prev = extract(s.alphas_cumprod_prev, t, nd)
            sigma = (eta * jnp.sqrt((1 - a_prev) / (1 - a_bar))
                     * jnp.sqrt(1 - a_bar / a_prev))
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, img.shape, img.dtype)
            mean = (pred_xstart * jnp.sqrt(a_prev)
                    + jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps)
            nonzero = (t != 0).astype(img.dtype).reshape(t.shape + (1,) * (nd - 1))
            return (mean + nonzero * sigma * z, key), None

        (final, _), _ = jax.lax.scan(step, (noise, rng), ts)
        return final

    # ------------------------------------------------------------- training

    def training_losses(self, model_fn: ModelFn, x_start, t, piece_code, rng,
                        *, block_size: int, patch_size: int,
                        add_mask: bool = False, grid_size: int = 3,
                        shared_perm: bool = True, _inject: dict | None = None):
        """Jigsaw diffusion training loss (gaussian_diffusion.py:736-843).

        x_start: (B, H, W, C) clean images, NHWC, in [-1, 1].
        t: (B,) spaced timestep indices.
        piece_code: (P, code_dim) canonical grid code.
        shared_perm=True reproduces the reference's one-permutation-per-batch
        (gaussian_diffusion.py:756); False gives per-sample permutations.

        Parity quirks kept: masks are drawn on the UNPERMUTED piece layout
        and not permuted with the pieces (gaussian_diffusion.py:764-769);
        visible regions of the model input are CLEAN pixels and masked holes
        are NOISED pixels (gaussian_diffusion.py:800).

        Returns dict with "loss" (B,), plus aux terms.
        """
        b = x_start.shape[0]
        grid = grid_size
        p = grid * grid
        sub = block_size // patch_size
        k_perm, k_mask, k_nx, k_nc = jax.random.split(rng, 4)
        inj = _inject or {}  # test hook: inject randomness for golden parity

        indices = inj.get(
            "indices",
            jigsaw.random_permutations(k_perm, b, p, shared=shared_perm))

        pieces = jigsaw.to_pieces(x_start, grid)
        if "piece_mask" in inj:
            piece_mask = inj["piece_mask"]
        elif add_mask:
            piece_mask = jigsaw.random_piece_masks(k_mask, b, grid)
        else:
            piece_mask = jnp.ones((b, p), dtype=jnp.float32)
        pieces = jigsaw.permute_pieces(pieces, indices)
        x_shuf = jigsaw.from_pieces(pieces, grid)
        masks = jigsaw.piece_mask_to_image(
            piece_mask, grid, block_size, x_start.shape[-1]).astype(x_start.dtype)

        code_shuf = piece_code[indices]  # (B, P, d)
        code_tok = jigsaw.piece_code_to_tokens(code_shuf, grid, sub)

        noise_x = inj.get(
            "noise_x", jax.random.normal(k_nx, x_shuf.shape, x_shuf.dtype))
        noise_c = inj.get(
            "noise_c", jax.random.normal(k_nc, code_tok.shape, code_tok.dtype))
        x_t = self.q_sample(x_shuf, t, noise_x)
        code_t = self.q_sample(code_tok, t, noise_c)
        x_t = x_t * (1 - masks) + masks * x_shuf

        img_out, code_out = model_fn(x_t, self.to_original_t(t), code_t)

        def target(start, noised, noise):
            if self.mean_type == "start_x":
                return start
            if self.mean_type == "epsilon":
                return noise
            return self.q_posterior_mean_variance(start, noised, t)[0]

        target_c = target(code_tok, code_t, noise_c)
        target_x = target(x_shuf, x_t, noise_x)

        mean_flat = lambda v: v.reshape(b, -1).mean(axis=-1)  # noqa: E731
        code_mse = mean_flat((target_c - code_out) ** 2)
        loss = code_mse
        img_mse = mean_flat((target_x - img_out) ** 2 * (1 - masks))
        if add_mask:
            loss = loss + img_mse
        return {
            "loss": loss,
            "code_mse": code_mse,
            "img_mse": img_mse,
            "indices": indices,
            "piece_mask": piece_mask,
        }


def create_diffusion(
    timestep_respacing: str | None = "",
    noise_schedule: str = "linear",
    predict_xstart: bool = True,
    sigma_small: bool = True,
    diffusion_steps: int = 1000,
) -> Diffusion:
    """Factory with the reference defaults (diffusion/__init__.py:10-46):
    predict_xstart=True (START_X), sigma_small=True (FIXED_SMALL), MSE loss,
    linear betas, 1000 base steps.
    """
    schedule = make_schedule(timestep_respacing, noise_schedule, diffusion_steps)
    return Diffusion(
        schedule=schedule,
        mean_type="start_x" if predict_xstart else "epsilon",
        var_type="fixed_small" if sigma_small else "fixed_large",
    )
