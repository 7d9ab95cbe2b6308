"""Torch-side activation goldens for the DiT forward + checkpoint converter.

The diffusion math has reference goldens (make_goldens.py); this closes the
remaining parity gap: proving that a torch JPDVT checkpoint run through
``torch_convert.torch_state_dict_to_params`` computes the SAME function in
Flax. A consistent layout error (e.g. mis-ordering timm's fused-qkv heads)
would survive every self-round-trip test — only a torch-side activation
golden catches it.

timm is not installed in this image, so this module vendors a ~100-line
torch reimplementation of the reference model's semantics
(reference: image_model/models.py:101-293 and the timm
``Attention``/``Mlp``/``PatchEmbed`` modules it instantiates):

- fused qkv Linear whose 3*D output is laid out (q|k|v, head, head_dim)
  via ``reshape(B,N,3,H,hd).permute(2,0,3,1,4)`` — the exact timm order;
- GELU(tanh) MLP, pre-LN (no affine) adaLN-Zero blocks, FinalLayer;
- the reference's dual-head quirk: the positional-code head reads the
  FINAL LAYER image output (models.py:288-290), which the reference
  hardcodes at 768-in (= 16*16*3 for the flagship, models.py:177);
  parameterized here the same way models/dit.py parameterizes it;
- frozen 2-D sin-cos pos_embed and cos-first timestep embedding.

Weights are randomly initialized WITHOUT the reference's zero-inits
(zeroed adaLN/final layers would mask conversion errors), except pos_embed
which is the deterministic sin-cos table in both frameworks.

Usage (regenerate the committed golden):
    python -m jpdvt_mt_ntnu_tpu.tools.make_dit_goldens --out tests/golden
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

# Small but structure-complete geometry: head_dim != num_heads, several
# blocks, patch grid > 1 in both axes.
GOLDEN_CFG = dict(input_size=32, patch_size=8, in_channels=3, hidden_size=64,
                  depth=2, num_heads=4, mlp_ratio=4.0, code_dim=8,
                  code_head_hidden=16)


def build_torch_dit(cfg: dict, seed: int = 0):
    """Construct the reference-semantics torch DiT with random weights."""
    import torch
    import torch.nn as nn

    from ..utils.pos_embed import get_2d_sincos_pos_embed

    D = cfg["hidden_size"]
    heads = cfg["num_heads"]
    p = cfg["patch_size"]
    cin = cfg["in_channels"]
    patch_dim = p * p * cin
    tokens_side = cfg["input_size"] // p

    class Attention(nn.Module):  # timm layout (vision_transformer.Attention)
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(D, 3 * D, bias=True)
            self.proj = nn.Linear(D, D, bias=True)

        def forward(self, x):
            B, N, C = x.shape
            hd = C // heads
            qkv = (self.qkv(x).reshape(B, N, 3, heads, hd)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
            x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):  # timm Mlp with GELU(tanh), models.py:112-114
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(D, int(D * cfg["mlp_ratio"]))
            self.fc2 = nn.Linear(int(D * cfg["mlp_ratio"]), D)

        def forward(self, x):
            return self.fc2(nn.functional.gelu(self.fc1(x),
                                               approximate="tanh"))

    class Block(nn.Module):  # models.py:101-122
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(D, elementwise_affine=False, eps=1e-6)
            self.norm2 = nn.LayerNorm(D, elementwise_affine=False, eps=1e-6)
            self.attn = Attention()
            self.mlp = Mlp()
            self.adaLN_modulation = nn.Sequential(
                nn.SiLU(), nn.Linear(D, 6 * D, bias=True))

        def forward(self, x, c):
            sa, ca, ga, sm, cm, gm = self.adaLN_modulation(c).chunk(6, dim=1)
            mod = lambda y, s, sc: y * (1 + sc.unsqueeze(1)) + s.unsqueeze(1)  # noqa: E731
            x = x + ga.unsqueeze(1) * self.attn(mod(self.norm1(x), sa, ca))
            x = x + gm.unsqueeze(1) * self.mlp(mod(self.norm2(x), sm, cm))
            return x

    class FinalLayer(nn.Module):  # models.py:125-142
        def __init__(self):
            super().__init__()
            self.norm_final = nn.LayerNorm(D, elementwise_affine=False,
                                           eps=1e-6)
            self.linear = nn.Linear(D, patch_dim, bias=True)
            self.adaLN_modulation = nn.Sequential(
                nn.SiLU(), nn.Linear(D, 2 * D, bias=True))

        def forward(self, x, c):
            shift, scale = self.adaLN_modulation(c).chunk(2, dim=1)
            x = self.norm_final(x) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
            return self.linear(x)

    class TEmb(nn.Module):  # models.py:27-64, cos-first frequency embedding
        def __init__(self):
            super().__init__()
            self.mlp = nn.Sequential(nn.Linear(256, D), nn.SiLU(),
                                     nn.Linear(D, D))

        def forward(self, t):
            half = 128
            freqs = torch.exp(-math.log(10000)
                              * torch.arange(half, dtype=torch.float32) / half)
            args = t[:, None].float() * freqs[None]
            return self.mlp(torch.cat([torch.cos(args), torch.sin(args)], -1))

    class RefDiT(nn.Module):  # models.py:145-293
        def __init__(self):
            super().__init__()
            self.x_embedder = nn.Conv2d(cin, D, kernel_size=p, stride=p,
                                        bias=True)
            self.t_embedder = TEmb()
            self.time_emb_in = nn.Linear(cfg["code_dim"], D)
            self.time_emb_out1 = nn.Linear(patch_dim, cfg["code_head_hidden"])
            self.time_emb_out2 = nn.Linear(cfg["code_head_hidden"],
                                           cfg["code_dim"])
            self.blocks = nn.ModuleList([Block() for _ in range(cfg["depth"])])
            self.final_layer = FinalLayer()
            pos = get_2d_sincos_pos_embed(D, tokens_side)
            self.register_buffer(
                "pos_embed", torch.from_numpy(pos).float().unsqueeze(0))

        def forward(self, x, t, code):
            x = self.x_embedder(x).flatten(2).transpose(1, 2)  # timm PatchEmbed
            x = x + self.time_emb_in(code) + self.pos_embed
            c = self.t_embedder(t)
            for block in self.blocks:
                x = block(x, c)
            x = self.final_layer(x, c)                        # (B, N, p*p*C)
            emb = self.time_emb_out2(
                nn.functional.silu(self.time_emb_out1(x)))    # dual head
            # unpatchify, models.py:227-240 (NCHW output)
            B, N, _ = x.shape
            h = int(N ** 0.5)
            img = x.reshape(B, h, h, p, p, cin)
            img = torch.einsum("nhwpqc->nchpwq", img).reshape(
                B, cin, h * p, h * p)
            return img, emb

    torch.manual_seed(seed)
    model = RefDiT()
    # Perturb biases away from the default uniform-around-zero so bias
    # conversion errors are visible too.
    with torch.no_grad():
        for name, tensor in model.named_parameters():
            if name.endswith("bias"):
                tensor.add_(torch.randn_like(tensor) * 0.05)
    model.eval()
    return model


def torch_state_dict_for_convert(model) -> dict[str, np.ndarray]:
    """state_dict with the key names the real checkpoints use
    (x_embedder.proj.* for the conv, t_embedder.mlp.{0,2}.*)."""
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace("x_embedder.weight", "x_embedder.proj.weight")
        k = k.replace("x_embedder.bias", "x_embedder.proj.bias")
        sd[k] = v.detach().cpu().numpy().astype(np.float32)
    return sd


def run_torch_forward(model, x_nchw: np.ndarray, t: np.ndarray,
                      code: np.ndarray):
    import torch

    with torch.no_grad():
        img, emb = model(torch.from_numpy(x_nchw), torch.from_numpy(t),
                         torch.from_numpy(code))
    return img.numpy(), emb.numpy()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden")
    args = ap.parse_args()

    rng = np.random.RandomState(123)
    model = build_torch_dit(GOLDEN_CFG, seed=0)
    cfg = GOLDEN_CFG
    B = 2
    x = rng.randn(B, cfg["in_channels"], cfg["input_size"],
                  cfg["input_size"]).astype(np.float32)
    t = np.array([17, 842], dtype=np.int64)
    n_tokens = (cfg["input_size"] // cfg["patch_size"]) ** 2
    code = rng.randn(B, n_tokens, cfg["code_dim"]).astype(np.float32)
    img, emb = run_torch_forward(model, x, t, code)

    rec = {"in_x_nchw": x, "in_t": t, "in_code": code,
           "out_img_nchw": img, "out_code": emb}
    for k, v in torch_state_dict_for_convert(model).items():
        rec[f"sd.{k}"] = v
    for k, v in cfg.items():
        rec[f"cfg.{k}"] = np.asarray(v)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "torch_dit_goldens.npz")
    np.savez_compressed(path, **rec)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, {len(rec)} arrays)")


if __name__ == "__main__":
    main()
