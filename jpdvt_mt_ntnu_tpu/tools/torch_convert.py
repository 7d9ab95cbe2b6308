"""PyTorch <-> Flax checkpoint conversion for JPDVT DiT weights.

Converts the reference's pickled torch checkpoints
(``{"model": state_dict, "ema": ..., ...}`` —
reference: image_model/train_JPDVT.py:410-418) into this framework's param
pytree, handling:

- conv patch-embed OIHW -> (p*p*C, D) matmul kernel with (row, col, channel)
  patch flattening (matches models/dit.py patchify order);
- fused qkv layout: timm orders the 3*D output dim as (qkv, head, head_dim)
  (timm Attention reshape), identical to our reshape — a plain transpose
  suffices;
- the frozen ``pos_embed`` buffer is skipped (a compile-time constant here);
- lenient loading: missing/extra torch keys are reported, not fatal
  (the reference loads key-filtered strict=False, inference.py:207-211).

Images: the torch model is NCHW, this framework is NHWC — transpose inputs
when comparing activations.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

_SIMPLE_LINEARS = {
    # torch prefix -> flax path (kernel transposed, bias copied)
    "t_embedder.mlp.0": ("t_embedder", "fc1"),
    "t_embedder.mlp.2": ("t_embedder", "fc2"),
    "time_emb_in": ("code_in",),
    "time_emb_out1": ("code_out1",),
    "time_emb_out2": ("code_out2",),
    "final_layer.adaLN_modulation.1": ("final_layer", "adaLN_modulation"),
    "final_layer.linear": ("final_layer", "linear"),
}

_BLOCK_LINEARS = {
    "adaLN_modulation.1": ("adaLN_modulation",),
    "attn.qkv": ("attn", "qkv"),
    "attn.proj": ("attn", "proj"),
    "mlp.fc1": ("mlp", "fc1"),
    "mlp.fc2": ("mlp", "fc2"),
}


def _set(tree: dict, path: tuple, leaf_name: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def torch_state_dict_to_params(state_dict: dict[str, Any],
                               depth: int) -> tuple[dict, list[str]]:
    """Convert a torch DiT state_dict to {"params": ...}. Returns
    (params, unused_torch_keys)."""
    sd = {k: np.asarray(v, dtype=np.float32)
          if not hasattr(v, "detach") else v.detach().cpu().numpy().astype(np.float32)
          for k, v in state_dict.items()}
    params: dict = {}
    used: set[str] = set()

    def linear(prefix: str, path: tuple):
        w, b = sd.get(f"{prefix}.weight"), sd.get(f"{prefix}.bias")
        if w is not None:
            _set(params, path, "kernel", w.T.copy())
            used.add(f"{prefix}.weight")
        if b is not None:
            _set(params, path, "bias", b.copy())
            used.add(f"{prefix}.bias")

    # Patch embed conv -> matmul kernel.
    w = sd.get("x_embedder.proj.weight")
    if w is not None:
        d, c, p, _ = w.shape
        _set(params, ("x_embedder",), "kernel",
             w.transpose(2, 3, 1, 0).reshape(p * p * c, d).copy())
        used.add("x_embedder.proj.weight")
    b = sd.get("x_embedder.proj.bias")
    if b is not None:
        _set(params, ("x_embedder",), "bias", b.copy())
        used.add("x_embedder.proj.bias")

    for prefix, path in _SIMPLE_LINEARS.items():
        linear(prefix, path)
    for i in range(depth):
        for suffix, sub in _BLOCK_LINEARS.items():
            linear(f"blocks.{i}.{suffix}", (f"block_{i}",) + sub)

    used.add("pos_embed")  # frozen buffer, constant in this framework
    unused = sorted(set(sd) - used)
    return {"params": params}, unused


def params_to_torch_state_dict(params: dict, depth: int,
                               patch_size: int, in_channels: int,
                               hidden_size: int,
                               pos_embed: np.ndarray | None = None) -> dict:
    """Inverse conversion (for round-trip tests and exporting to torch)."""
    p = params["params"]
    out: dict[str, np.ndarray] = {}

    def linear(prefix: str, node: dict):
        out[f"{prefix}.weight"] = np.asarray(node["kernel"]).T.copy()
        out[f"{prefix}.bias"] = np.asarray(node["bias"]).copy()

    k = np.asarray(p["x_embedder"]["kernel"])  # (p*p*C, D)
    d = k.shape[1]
    out["x_embedder.proj.weight"] = (
        k.reshape(patch_size, patch_size, in_channels, d)
        .transpose(3, 2, 0, 1).copy())
    out["x_embedder.proj.bias"] = np.asarray(p["x_embedder"]["bias"]).copy()

    for prefix, path in _SIMPLE_LINEARS.items():
        node = p
        for q in path:
            node = node[q]
        linear(prefix, node)
    for i in range(depth):
        for suffix, sub in _BLOCK_LINEARS.items():
            node = p[f"block_{i}"]
            for q in sub:
                node = node[q]
            linear(f"blocks.{i}.{suffix}", node)
    if pos_embed is not None:
        out["pos_embed"] = pos_embed[None].astype(np.float32)
    return out


def _flatten(tree: dict, prefix="") -> dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = v
    return tree


def save_npz_params(path: str, params: dict) -> None:
    np.savez_compressed(path, **_flatten(params))


def load_npz_params(path: str) -> dict:
    """Load a flattened-params npz (converter output or a durable export).

    Keys suffixed ``__bf16`` hold bfloat16 bit patterns as uint16 (numpy
    can't self-describe bfloat16 in the npy header — tools/export_ckpt.py
    writes these); they are decoded and upcast to float32 here so callers
    see ordinary float params either way."""
    import ml_dtypes

    with np.load(path) as z:
        flat = {}
        for k in z.files:
            if k.endswith("__bf16"):
                flat[k[: -len("__bf16")]] = (
                    z[k].view(ml_dtypes.bfloat16).astype(np.float32))
            else:
                flat[k] = z[k]
        return _unflatten(flat)


def reassemble_artifact(manifest_path: str, out_npz: str) -> dict:
    """Reassemble a split-npz durable artifact (tools/export_ckpt.py) into
    one npz, verifying per-part and whole-file sha256 from the manifest.
    Returns the parsed manifest."""
    import hashlib
    import json

    with open(manifest_path) as f:
        manifest = json.load(f)
    art_dir = os.path.dirname(os.path.abspath(manifest_path))
    whole = hashlib.sha256()
    with open(out_npz, "wb") as out:
        for part in manifest["parts"]:
            with open(os.path.join(art_dir, part["file"]), "rb") as pf:
                chunk = pf.read()
            got = hashlib.sha256(chunk).hexdigest()
            if got != part["sha256"]:
                raise ValueError(
                    f"integrity failure: {part['file']} sha256 {got} != "
                    f"manifest {part['sha256']}")
            whole.update(chunk)
            out.write(chunk)
    if whole.hexdigest() != manifest["npz_sha256"]:
        raise ValueError(
            f"integrity failure: reassembled npz sha256 {whole.hexdigest()} "
            f"!= manifest {manifest['npz_sha256']}")
    return manifest


def load_artifact_params(path: str) -> tuple[dict, int]:
    """Load params (+ the training step they were exported at) from a
    durable artifact: either a ``*.manifest.json`` (split-npz export,
    sha256-verified) or a bare flattened-params ``.npz`` (converter
    output / reassembled export; step 0). The training-side entry point
    for params-only warm starts (``train.warm_start=artifacts/...``)."""
    import tempfile

    if path.endswith(".json"):
        with tempfile.TemporaryDirectory() as tmp:
            npz = os.path.join(tmp, "params.npz")
            manifest = reassemble_artifact(path, npz)
            return load_npz_params(npz), int(manifest.get("step", 0))
    return load_npz_params(path), 0


def convert_checkpoint(torch_path: str, out_path: str, depth: int = 12,
                       which: str = "ema") -> list[str]:
    """CLI helper: torch .pt -> flax .npz. Returns unused keys."""
    import torch

    ckpt = torch.load(torch_path, map_location="cpu", weights_only=False)
    sd = ckpt[which] if isinstance(ckpt, dict) and which in ckpt else ckpt
    params, unused = torch_state_dict_to_params(sd, depth)
    save_npz_params(out_path, params)
    return unused


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_npz")
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--which", default="ema", choices=["ema", "model"])
    a = ap.parse_args()
    unused = convert_checkpoint(a.torch_ckpt, a.out_npz, a.depth, a.which)
    if unused:
        print(f"unused torch keys ({len(unused)}): {unused[:10]} ...")
    print(f"wrote {a.out_npz}")
