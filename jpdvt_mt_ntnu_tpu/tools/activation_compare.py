"""Golden-activation compare: a reference-format torch checkpoint vs its
converted Flax params, forward-pass outputs side by side.

Step 2 of the accuracy-parity path (scripts/parity_when_available.sh):
after ``torch_convert`` produces the npz, this tool loads the SAME torch
weights into the independently-written reference-semantics torch DiT
(tools.make_dit_goldens.build_torch_dit — timm fused-qkv layout, adaLN
chunk order, dual head reading the final-layer image output; reference:
image_model/models.py:101-293) and asserts both stacks compute the same
function on random inputs at fp32 tolerance. A consistent conversion error
(e.g. mis-ordered qkv heads) passes every self-round-trip test and shows
up only here.

Usage:
    python -m jpdvt_mt_ntnu_tpu.tools.activation_compare CKPT.pt NPZ \
        [--model JPDVT] [--image-size 192] [--which ema] [--tol 2e-4] \
        [--depth 0 --hidden-size 0 --num-heads 0 --patch-size 0]  # 0 = registry

Exit code 0 = within tolerance; 1 = mismatch (printed per output head).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def compare(ckpt_path: str, npz_path: str, model_name: str = "JPDVT",
            image_size: int = 192, which: str = "ema", tol: float = 2e-4,
            batch: int = 2, seed: int = 0, **overrides) -> dict:
    """Returns {"img_max_abs": float, "code_max_abs": float, "ok": bool}."""
    import jax
    import jax.numpy as jnp
    import torch

    from ..models import create_model
    from .make_dit_goldens import build_torch_dit, run_torch_forward
    from .torch_convert import load_npz_params

    ov = {k: v for k, v in overrides.items() if v}
    jmodel, jcfg = create_model(model_name, input_size=image_size,
                                attn_impl="xla", **ov)
    tcfg = dict(input_size=jcfg.input_size, patch_size=jcfg.patch_size,
                in_channels=jcfg.in_channels, hidden_size=jcfg.hidden_size,
                depth=jcfg.depth, num_heads=jcfg.num_heads,
                mlp_ratio=jcfg.mlp_ratio, code_dim=jcfg.code_dim,
                code_head_hidden=jcfg.code_head_hidden)
    tmodel = build_torch_dit(tcfg, seed=0)

    # Load the checkpoint's weights into the torch-side oracle. Real
    # checkpoints use timm names (x_embedder.proj.*); the oracle's plain
    # Conv2d drops the ".proj". pos_embed is a deterministic buffer in
    # both (skipped by the converter; overwritten identically here).
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt[which] if isinstance(ckpt, dict) and which in ckpt else ckpt
    renamed = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        k = k.replace("x_embedder.proj.weight", "x_embedder.weight")
        k = k.replace("x_embedder.proj.bias", "x_embedder.bias")
        renamed[k] = torch.as_tensor(np.asarray(v))
    missing, unexpected = tmodel.load_state_dict(renamed, strict=False)
    # Only the pos_embed buffer may legitimately be absent/extra.
    bad = [k for k in list(missing) + list(unexpected) if "pos_embed" not in k]
    if bad:
        raise ValueError(f"torch checkpoint does not match the {model_name} "
                         f"geometry: unmatched keys {bad[:8]}")

    params = load_npz_params(npz_path)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(
        (batch, jcfg.in_channels, image_size, image_size)).astype(np.float32)
    t = np.asarray(rng.integers(0, 1000, size=batch), dtype=np.int64)
    code = rng.standard_normal(
        (batch, jcfg.num_tokens, jcfg.code_dim)).astype(np.float32)

    t_img, t_code = run_torch_forward(tmodel, x, t, code)
    with jax.default_matmul_precision("highest"):
        j_img, j_code = jmodel.apply(params, jnp.asarray(
            x.transpose(0, 2, 3, 1)), jnp.asarray(t, jnp.int32),
            jnp.asarray(code))
    j_img = np.asarray(j_img, np.float32).transpose(0, 3, 1, 2)
    j_code = np.asarray(j_code, np.float32)

    d_img = float(np.abs(j_img - t_img).max())
    d_code = float(np.abs(j_code - t_code).max())
    return {"img_max_abs": d_img, "code_max_abs": d_code,
            "ok": d_img <= tol and d_code <= tol}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt")
    ap.add_argument("npz")
    ap.add_argument("--model", default="JPDVT")
    ap.add_argument("--image-size", type=int, default=192)
    ap.add_argument("--which", default="ema", choices=["ema", "model"])
    ap.add_argument("--tol", type=float, default=2e-4)
    # 0 = take the registry's value; nonzero overrides (smoke/test models)
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("--hidden-size", type=int, default=0)
    ap.add_argument("--num-heads", type=int, default=0)
    ap.add_argument("--patch-size", type=int, default=0)
    a = ap.parse_args(argv)
    r = compare(a.ckpt, a.npz, a.model, a.image_size, a.which, a.tol,
                depth=a.depth, hidden_size=a.hidden_size,
                num_heads=a.num_heads, patch_size=a.patch_size)
    status = "OK" if r["ok"] else "MISMATCH"
    print(f"activation_compare: {status} img_max_abs={r['img_max_abs']:.3e} "
          f"code_max_abs={r['code_max_abs']:.3e} (tol {a.tol:.0e})")
    return 0 if r["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
