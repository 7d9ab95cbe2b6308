"""Torch-side reference METRIC pipeline — the checkpoint-rehearsal oracle.

make_dit_goldens vendors the reference *model* semantics; this module vendors
the reference's metric-defining *pipeline* semantics on top of it, so the
full checkpoint-conversion loop can be rehearsed end-to-end without the real
2850000.pt: reference-format torch checkpoint -> ``torch_convert`` -> our
``run_eval`` faithful solve, asserted to produce IDENTICAL predicted
permutations image-by-image against this independent torch-side run
(tests/test_ckpt_rehearsal.py). When the real checkpoint/data appear, parity
is one command.

Everything here is an independent reimplementation of the reference call
stack (written from the reference's formulas, not from our core/ modules):

- linear beta schedule scaled by 1000/T
  (reference: image_model/diffusion/gaussian_diffusion.py:108-117);
- timestep respacing section logic (reference: diffusion/respace.py:12-62)
  and the respaced-beta recomputation (respace.py:79-86);
- the faithful ``p_sample_loop`` with the noise-not-img quirk: every
  ``p_sample`` receives the ORIGINAL noise template, never the running
  sample (gaussian_diffusion.py:522; SURVEY.md §3.2), with START_X +
  forced FIXED_SMALL posterior (gaussian_diffusion.py:281-288,388-430);
- per-piece code pooling, Manhattan distances and the greedy
  ``find_permutation`` -> ``argsort`` recovery (inference.py:294-306,
  113-125).

Test tooling only — NOT framework code (the framework's own sampler lives
in core/diffusion.py and is designed, not transliterated).
"""

from __future__ import annotations

import numpy as np


def linear_betas(num_steps: int = 1000) -> np.ndarray:
    """gaussian_diffusion.py:108-117 — linear schedule scaled by 1000/T."""
    scale = 1000.0 / num_steps
    return np.linspace(scale * 1e-4, scale * 2e-2, num_steps,
                       dtype=np.float64)


def space_timesteps_sections(num_timesteps: int, counts: list[int]) -> list[int]:
    """respace.py:12-62 section-count spacing (no 'ddimN' branch)."""
    size_per = num_timesteps // len(counts)
    extra = num_timesteps % len(counts)
    out, start = [], 0
    for i, count in enumerate(counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur, taken = 0.0, []
        for _ in range(count):
            taken.append(start + round(cur))
            cur += stride
        out += taken
        start += size
    return sorted(set(out))


class RefSpacedFaithfulSampler:
    """The reference eval-time sampler, torch-side, float64 tables."""

    def __init__(self, num_steps: int = 1000, respacing: int = 250):
        betas = linear_betas(num_steps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.timestep_map = space_timesteps_sections(num_steps, [respacing])
        # Respaced betas (respace.py:79-86): 1 - acp[t]/acp[last_kept].
        last = 1.0
        new_betas = []
        for t in self.timestep_map:
            new_betas.append(1.0 - alphas_cumprod[t] / last)
            last = alphas_cumprod[t]
        nb = np.asarray(new_betas, dtype=np.float64)
        acp = np.cumprod(1.0 - nb)
        acp_prev = np.append(1.0, acp[:-1])
        # Posterior mean coefficients (gaussian_diffusion.py:197-203).
        self.c1 = nb * np.sqrt(acp_prev) / (1.0 - acp)
        self.c2 = (1.0 - acp_prev) * np.sqrt(1.0 - nb) / (1.0 - acp)
        self.posterior_variance = nb * (1.0 - acp_prev) / (1.0 - acp)

    def p_sample_loop_faithful(self, model_fn, condition, noise,
                               rng: np.random.Generator):
        """inference.py:281-290 via p_sample_loop_progressive
        (gaussian_diffusion.py:480-529) with the quirk: the model and the
        posterior always see the ORIGINAL ``noise``; the running sample is
        computed (and discarded) every step; the t=0 output (z=0,
        gaussian_diffusion.py:424-430) is returned."""
        n = len(self.timestep_map)
        final = None
        for i in reversed(range(n)):
            # _WrappedModel (respace.py:124-129) maps spaced t -> original.
            t_orig = self.timestep_map[i]
            x_start = model_fn(condition, t_orig, noise)  # START_X: 2nd head
            mean = self.c1[i] * x_start + self.c2[i] * noise
            if i == 0:
                final = mean  # z = 0 at t == 0
            else:
                sigma = np.sqrt(self.posterior_variance[i])
                _discarded = mean + sigma * rng.standard_normal(noise.shape)
        return final


def find_permutation_greedy(dist: np.ndarray) -> list[int]:
    """inference.py:113-125 — per-column argmin with 1e9 row knockout."""
    d = dist.copy()
    order = []
    for _ in range(d.shape[1]):
        col = len(order)
        row = int(np.argmin(d[:, col]))
        order.append(row)
        d[row, :] = 1e9
    return order


def recover_permutation(final_codes: np.ndarray, canon: np.ndarray,
                        grid: int, sub: int) -> np.ndarray:
    """inference.py:294-306: group tokens '(p1 h1 p2 w1) d -> (p1 p2)
    (h1 w1) d', mean-pool, Manhattan distances, greedy, argsort."""
    n_tokens, d = final_codes.shape
    side = grid * sub
    assert n_tokens == side * side
    g = final_codes.reshape(grid, sub, grid, sub, d)
    pooled = g.transpose(0, 2, 1, 3, 4).reshape(grid * grid, sub * sub, d).mean(1)
    dist = np.abs(pooled[:, None, :] - canon[None, :, :]).sum(-1)
    order = find_permutation_greedy(dist)
    return np.argsort(np.asarray(order))


def reference_solve(model, x_scrambled_nchw: np.ndarray, noise: np.ndarray,
                    canon: np.ndarray, grid: int, sub: int,
                    respacing: int = 250, seed: int = 0) -> np.ndarray:
    """Full torch-side metric pipeline for a batch: returns (B, G*G) preds."""
    import torch

    sampler = RefSpacedFaithfulSampler(respacing=respacing)

    def model_fn(cond, t_orig, x):
        with torch.no_grad():
            t = torch.full((cond.shape[0],), t_orig, dtype=torch.long)
            _, code = model(torch.from_numpy(cond).float(), t,
                            torch.from_numpy(x.astype(np.float32)))
        return code.numpy().astype(np.float64)

    rng = np.random.default_rng(seed)
    final = sampler.p_sample_loop_faithful(model_fn, x_scrambled_nchw,
                                           noise.astype(np.float64), rng)
    return np.stack([recover_permutation(final[b], canon, grid, sub)
                     for b in range(final.shape[0])])
