"""Record golden tensors from the REFERENCE implementation for parity tests.

Run offline (needs the reference checkout + torch/einops):

    python -m jpdvt_mt_ntnu_tpu.tools.make_goldens \
        --reference /root/reference --out tests/golden

It imports the reference's diffusion package (pure numpy/torch math — the
model zoo is NOT imported, so timm is not needed) and records:

- schedule tables for the full 1000-step linear chain, the "250" respacing,
  "ddim25", and squaredcos_cap_v2 (+ timestep maps);
- q_sample / q_posterior outputs with fixed inputs and injected noise;
- a full deterministic p_sample_loop solve with a linear toy "model"
  (deterministic because the reference's faithful-quirk loop never feeds
  samples back, so RNG never affects the final output — SURVEY.md §3.2);
- a deterministic DDIM(eta=0) chain computed with an independent numpy
  implementation of Song et al. eq. 12 over the reference's respaced tables
  (the reference's own DDIM path is dead code with a broken call signature,
  gaussian_diffusion.py:546-553).

The npz files are tiny and committed so the test suite never needs the
reference checkout or torch.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="tests/golden")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(args.reference, "image_model"))
    import torch  # noqa: PLC0415

    from diffusion import create_diffusion  # reference pkg  # noqa: PLC0415
    from diffusion import gaussian_diffusion as gd  # noqa: PLC0415

    os.makedirs(args.out, exist_ok=True)
    torch.manual_seed(0)
    rec: dict[str, np.ndarray] = {}

    # ---- schedule tables ---------------------------------------------------
    for tag, respacing in [("full", ""), ("s250", "250"), ("ddim25", "ddim25")]:
        d = create_diffusion(respacing)
        rec[f"{tag}_betas"] = d.betas
        rec[f"{tag}_alphas_cumprod"] = d.alphas_cumprod
        rec[f"{tag}_posterior_variance"] = d.posterior_variance
        rec[f"{tag}_posterior_log_variance_clipped"] = d.posterior_log_variance_clipped
        rec[f"{tag}_posterior_mean_coef1"] = d.posterior_mean_coef1
        rec[f"{tag}_posterior_mean_coef2"] = d.posterior_mean_coef2
        rec[f"{tag}_sqrt_alphas_cumprod"] = d.sqrt_alphas_cumprod
        rec[f"{tag}_sqrt_one_minus_alphas_cumprod"] = d.sqrt_one_minus_alphas_cumprod
        rec[f"{tag}_timestep_map"] = np.asarray(d.timestep_map, dtype=np.int64)
    rec["cosine_betas"] = gd.get_named_beta_schedule("squaredcos_cap_v2", 100)

    # ---- q_sample / posterior with injected randomness ----------------------
    rng = np.random.RandomState(42)
    x0 = rng.randn(4, 9, 8).astype(np.float32)
    noise = rng.randn(4, 9, 8).astype(np.float32)
    xt = rng.randn(4, 9, 8).astype(np.float32)
    t = np.array([0, 1, 100, 249], dtype=np.int64)
    d250 = create_diffusion("250")
    rec["io_x0"], rec["io_noise"], rec["io_xt"], rec["io_t"] = x0, noise, xt, t
    rec["io_q_sample"] = d250.q_sample(
        torch.from_numpy(x0), torch.from_numpy(t), noise=torch.from_numpy(noise)
    ).numpy()
    pm, pv, plv = d250.q_posterior_mean_variance(
        torch.from_numpy(x0), torch.from_numpy(xt), torch.from_numpy(t))
    rec["io_post_mean"], rec["io_post_var"], rec["io_post_logvar"] = (
        pm.numpy(), pv.numpy(), plv.numpy())

    # ---- full deterministic faithful solve with a linear toy model ----------
    # model(condition, t, x) -> (ignored_image, A @ x * f(t) + b), linear in x.
    dim = 8
    ntok = 16
    A = rng.randn(dim, dim).astype(np.float32) * 0.3
    bvec = rng.randn(dim).astype(np.float32) * 0.1
    cond = rng.randn(1, 3, 48, 48).astype(np.float32)
    noise_tmpl = rng.randn(1, ntok, dim).astype(np.float32)
    tA, tb = torch.from_numpy(A), torch.from_numpy(bvec)

    def toy_model(condition, ts, x):
        f = (1.0 + ts.float().view(-1, 1, 1) / 1000.0)
        return condition, torch.einsum("bnd,de->bne", x, tA) * f + tb

    cpu = torch.device("cpu")
    out = d250.p_sample_loop(
        toy_model, torch.from_numpy(cond), noise_tmpl.shape,
        torch.from_numpy(noise_tmpl), clip_denoised=False, device=cpu)
    rec["toy_A"], rec["toy_b"] = A, bvec
    rec["toy_cond"], rec["toy_noise"] = cond, noise_tmpl
    rec["toy_solve"] = out.numpy()

    # clip_denoised=True variant exercises the clamp path.
    out_c = d250.p_sample_loop(
        toy_model, torch.from_numpy(cond), noise_tmpl.shape,
        torch.from_numpy(noise_tmpl), clip_denoised=True, device=cpu)
    rec["toy_solve_clip"] = out_c.numpy()

    # ---- independent deterministic DDIM (eta=0) over the same toy model -----
    dd = create_diffusion("ddim25")
    x = noise_tmpl.copy()
    tmap = np.asarray(dd.timestep_map)
    for i in range(dd.num_timesteps - 1, -1, -1):
        ts = torch.full((1,), int(tmap[i]), dtype=torch.float32)
        pred = toy_model(None, ts, torch.from_numpy(x))[1].numpy()
        a_bar = dd.alphas_cumprod[i]
        a_prev = dd.alphas_cumprod_prev[i]
        eps = (np.sqrt(1.0 / a_bar) * x - pred) / np.sqrt(1.0 / a_bar - 1.0)
        x = (pred * np.sqrt(a_prev) + np.sqrt(1 - a_prev) * eps).astype(np.float32)
    rec["toy_ddim25"] = x

    # ---- full training_losses composite with injected randomness ------------
    # Monkeypatch every randomness source the reference draws internally
    # (np.random.permutation/randint, random.sample, torch.randn_like) so the
    # jigsaw shuffle + masking + q-sampling + composite + loss can be
    # replayed bit-for-bit by the JAX implementation.
    import random as pyrandom
    import tempfile

    d_full = create_diffusion("")
    rng2 = np.random.RandomState(7)
    B, C, H = 2, 3, 48
    x_start = rng2.randn(B, C, H, H).astype(np.float32)

    # canonical 3x3 8-dim code, same as the model-side table
    def sincos_code():
        coords = np.arange(3, dtype=np.float64)
        w = np.tile(coords, 3)
        h = np.repeat(coords, 3)

        def one(dim, pos):
            omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
            omega = 1.0 / 10000**omega
            out = np.einsum("m,d->md", pos, omega)
            return np.concatenate([np.sin(out), np.cos(out)], 1)

        return np.concatenate([one(4, w), one(4, h)], axis=1)

    code = sincos_code().astype(np.float32)  # (9, 8)
    t_tl = np.array([7, 500], dtype=np.int64)
    perm = np.array([4, 2, 8, 0, 6, 1, 7, 3, 5])
    r_values = [1, 2]
    mask_lists = [[3], [0, 7]]
    noise_x = rng2.randn(B, C, H, H).astype(np.float32)
    noise_c = rng2.randn(B, 36, 8).astype(np.float32)  # 9 pieces x 4 tokens

    orig_perm, orig_randint = np.random.permutation, np.random.randint
    orig_sample, orig_randn_like = pyrandom.sample, torch.randn_like
    randn_queue = [torch.from_numpy(noise_x), torch.from_numpy(noise_c)]
    rq = list(randn_queue)
    rv = list(r_values)
    ml = list(mask_lists)
    np.random.permutation = lambda n: perm.copy()
    np.random.randint = lambda lo, hi=None: rv.pop(0)
    pyrandom.sample = lambda population, k: ml.pop(0)
    torch.randn_like = lambda x: rq.pop(0)
    cwd = os.getcwd()
    try:
        os.chdir(tempfile.mkdtemp())  # training_losses plt.imsave side-effect

        def lin_model(x, ts, te):
            return 0.5 * x, 0.25 * te

        terms = d_full.training_losses(
            lin_model, torch.from_numpy(x_start), torch.from_numpy(t_tl),
            torch.from_numpy(code).unsqueeze(0), block_size=16, patch_size=8,
            add_mask=True, grid_size=3)
    finally:
        os.chdir(cwd)
        np.random.permutation = orig_perm
        np.random.randint = orig_randint
        pyrandom.sample = orig_sample
        torch.randn_like = orig_randn_like

    rec["tl_x_start"] = x_start
    rec["tl_code"] = code
    rec["tl_t"] = t_tl
    rec["tl_perm"] = perm
    rec["tl_r"] = np.array(r_values)
    rec["tl_mask_lists"] = np.array([m + [-1] * (9 - len(m))
                                     for m in mask_lists])
    rec["tl_noise_x"] = noise_x
    rec["tl_noise_c"] = noise_c
    rec["tl_loss"] = terms["loss"].numpy()

    path = os.path.join(args.out, "reference_goldens.npz")
    np.savez_compressed(path, **rec)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, {len(rec)} arrays)")


if __name__ == "__main__":
    main()
