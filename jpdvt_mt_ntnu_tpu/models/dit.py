"""Diffusion Vision Transformer (DiT) with adaLN-Zero, dual-headed for JPDVT.

TPU-native Flax rebuild of the reference backbone
(reference: image_model/models.py:145-293):

- Patch embedding is an exact reshape+matmul (stride == kernel makes the
  conv equivalent), so the whole network is dense matmuls on the MXU.
- Attention runs through the Pallas fused kernel (ops/attention.py) with an
  XLA fallback.
- Dual output heads: unpatchified image reconstruction AND an 8-dim
  positional-code prediction per token. As in the reference (models.py:288),
  the code head reads the *final layer output* (p^2*C dims). The reference
  hardcodes that head at 768-in (models.py:177), which only works for
  patch_size 16 / 3 channels; here it is parameterized so JPDVT-S/T are
  actually usable (documented reference defect, SURVEY.md §7.4).
- Weight init matches models.py:187-225: xavier-uniform linears, N(0, 0.02)
  timestep/code-head weights, zero adaLN modulations and zero final linear.
- The fixed 2-D sin-cos pos_embed (models.py:196-198) is a compile-time
  constant, not a parameter (it is frozen in the reference).

Compute dtype is configurable (bf16 by default on TPU for speed, fp32 for
parity runs); parameters are always fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pos_embed import get_2d_sincos_pos_embed, timestep_embedding

Dtype = Any

_xavier = nn.initializers.xavier_uniform()
_normal02 = nn.initializers.normal(stddev=0.02)
_zeros = nn.initializers.zeros_init()


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 192
    patch_size: int = 16
    in_channels: int = 3
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    code_dim: int = 8
    code_head_hidden: int = 64
    learn_sigma: bool = False
    dtype: Dtype = jnp.float32       # compute dtype
    param_dtype: Dtype = jnp.float32
    attn_impl: Optional[str] = None  # None = auto (pallas on TPU)
    # "int8": weight+activation int8 on the large per-block projections
    # (qkv / attn out / mlp fc1+fc2) via ops/quant.py — the v5e MXU's
    # 2x-peak serving path. Params stay fp32; quantization is in-graph
    # (checkpoints are dtype-identical to the bf16/fp32 paths).
    quant: Optional[str] = None
    # >0 swaps every block's MLP for an expert-choice-routed MoE with this
    # many experts (models/moe.py); 0 = dense (reference parity). The
    # expert dim shards over the optional 'ep' mesh axis.
    moe_experts: int = 0
    moe_capacity: float = 2.0
    # Sequence/context parallelism: a jax.sharding.Mesh carrying a 'seq'
    # axis. Set together with attn_impl="ring" to run ring attention over
    # it (parallel/sequence.py) with activations token-sharded. None = no
    # sequence parallelism. (Mesh is hashable, so the config stays a valid
    # static argument.)
    seq_mesh: Optional[Any] = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def tokens_per_side(self) -> int:
        return self.input_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.tokens_per_side ** 2

    @property
    def patch_dim(self) -> int:
        return self.patch_size * self.patch_size * self.out_channels


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1 + scale[:, None]) + shift[:, None]


def patchify(x: jnp.ndarray, cfg: DiTConfig) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, p*p*C) in (row, col, channel) patch order."""
    b = x.shape[0]
    n, p = cfg.tokens_per_side, cfg.patch_size
    x = x.reshape(b, n, p, n, p, cfg.in_channels)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, cfg.num_tokens, -1)


def embed_condition(params, x: jnp.ndarray, cfg: DiTConfig) -> jnp.ndarray:
    """Precompute the condition-image embedding (patch embed + pos table).

    The result feeds ``DiT.__call__(..., x_is_tokens=True)``; computing it
    once per solve instead of once per sampler step removes loop-invariant
    work (profiled at ~10-15% of a solve step)."""
    dt = cfg.dtype
    k = params["params"]["x_embedder"]["kernel"].astype(dt)
    bias = params["params"]["x_embedder"]["bias"].astype(dt)
    tokens = patchify(x.astype(dt), cfg) @ k + bias
    pos = jnp.asarray(get_2d_sincos_pos_embed(
        cfg.hidden_size, cfg.tokens_per_side), dtype=dt)
    return tokens + pos[None]


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.quant == "int8":
            # Same param pytree paths as the nn.Dense modules below
            # (fc1/fc2 -> kernel/bias), so checkpoints are interchangeable.
            from ..ops.quant import int8_dense

            k1, b1 = _LinearParams(x.shape[-1], self.hidden,
                                   self.param_dtype, name="fc1")()
            k2, b2 = _LinearParams(self.hidden, self.out,
                                   self.param_dtype, name="fc2")()
            h = nn.gelu(int8_dense(x.astype(self.dtype), k1, b1),
                        approximate=True)
            return int8_dense(h, k2, b2)
        x = nn.Dense(self.hidden, kernel_init=_xavier, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.out, kernel_init=_xavier, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class _LinearParams(nn.Module):
    """Bare Dense parameters (kernel + bias) without the matmul, so custom
    kernels can consume them directly. Same init and pytree paths as the
    nn.Dense modules they replace (attn/{qkv,proj}/{kernel,bias})."""

    features_in: int
    features_out: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _xavier,
                       (self.features_in, self.features_out), self.param_dtype)
        b = self.param("bias", _zeros, (self.features_out,), self.param_dtype)
        return k, b


class Attention(nn.Module):
    """timm-compatible MHA: fused qkv projection + output projection.

    Implementations (ops/attention.py): "block" runs the WHOLE sublayer
    (qkv proj + MHA + out proj) as one Pallas program with zero HBM
    intermediates; "pallas"/"flash" run Pallas attention kernels between
    XLA projections; "xla" is the einsum oracle.
    """

    hidden_size: int
    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: Optional[str] = None
    seq_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import (default_impl, dense_to_block_weights,
                                     fused_attention_block,
                                     fused_qkv_attention,
                                     fused_qkv_attention_xla,
                                     fused_qkv_attention_xla2)

        dt = self.dtype
        qkv_k, qkv_b = _LinearParams(self.hidden_size, 3 * self.hidden_size,
                                     self.param_dtype, name="qkv")()
        proj_k, proj_b = _LinearParams(self.hidden_size, self.hidden_size,
                                       self.param_dtype, name="proj")()
        if self.quant == "int8":
            # Quantized projections around the bf16 attention core: the
            # score/value matmuls stay bf16 (tiny at N <= 324 and
            # softmax-sensitive; ops/quant.py docstring).
            from ..ops.quant import int8_dense

            qkv = int8_dense(x.astype(dt), qkv_k, qkv_b)
            o = fused_qkv_attention_xla(qkv, self.num_heads)
            return int8_dense(o, proj_k, proj_b)
        impl = self.attn_impl or default_impl(x.shape[1])
        if impl == "xla_split":
            from ..ops.attention import split_qkv_attention_xla

            o = split_qkv_attention_xla(x.astype(dt), qkv_k.astype(dt),
                                        qkv_b.astype(dt), self.num_heads)
            return o @ proj_k.astype(dt) + proj_b.astype(dt)
        if impl in ("block", "block_interpret"):
            wq, bq, wp, bp = dense_to_block_weights(
                qkv_k.astype(dt), qkv_b.astype(jnp.float32),
                proj_k.astype(dt), proj_b.astype(jnp.float32),
                self.num_heads)
            return fused_attention_block(
                x.astype(dt), wq, bq, wp, bp, self.num_heads,
                impl == "block_interpret", None).astype(dt)
        qkv = x.astype(dt) @ qkv_k.astype(dt) + qkv_b.astype(dt)
        if impl == "ring":
            # Sequence-parallel ring attention over the mesh's 'seq' axis
            # (parallel/sequence.py): tokens sharded, K/V blocks rotate by
            # ppermute with online-softmax accumulation.
            from ..parallel.sequence import ring_attention

            o = ring_attention(qkv, self.num_heads, self.seq_mesh)
        elif impl == "pallas":
            o = fused_qkv_attention(qkv, self.num_heads)
        elif impl == "interpret":
            o = fused_qkv_attention(qkv, self.num_heads, True)
        elif impl == "xla2":
            o = fused_qkv_attention_xla2(qkv, self.num_heads)
        elif impl == "flash":
            from ..ops.flash_attention import fused_qkv_flash_attention

            o = fused_qkv_flash_attention(qkv, self.num_heads)
        else:
            # NOT jax.checkpoint-wrapped, deliberately: recomputing the
            # attention core in backward (flash-style, to avoid storing
            # the (B,H,N,N) probs residual) was built and MEASURED WORSE
            # on hardware — 88.8 vs 82.9 ms/step for the flagship train
            # step at batch 96 (PERF.md round-3 train profile). XLA's own
            # residual schedule beats forced remat at these geometries.
            o = fused_qkv_attention_xla(qkv, self.num_heads)
        return o @ proj_k.astype(dt) + proj_b.astype(dt)


class DiTBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero conditioning (models.py:101-122)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: Optional[str] = None
    moe_experts: int = 0
    moe_capacity: float = 2.0
    seq_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * self.hidden_size, kernel_init=_zeros, bias_init=_zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="adaLN_modulation")(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-6, use_scale=False, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        attn = Attention(self.hidden_size, self.num_heads, dtype=self.dtype,
                         param_dtype=self.param_dtype, attn_impl=self.attn_impl,
                         quant=self.quant, seq_mesh=self.seq_mesh,
                         name="attn")
        if self.moe_experts:
            from .moe import ExpertChoiceMoE

            mlp = ExpertChoiceMoE(
                int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                num_experts=self.moe_experts,
                capacity_factor=self.moe_capacity, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")
        else:
            mlp = Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      quant=self.quant, name="mlp")
        x = x + gate_msa[:, None] * attn(modulate(ln("norm1")(x), shift_msa, scale_msa))
        x = x + gate_mlp[:, None] * mlp(modulate(ln("norm2")(x), shift_mlp, scale_mlp))
        return x


class FinalLayer(nn.Module):
    """adaLN-modulated projection to patch pixels (models.py:125-142)."""

    hidden_size: int
    patch_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(2 * self.hidden_size, kernel_init=_zeros, bias_init=_zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm_final")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(self.patch_dim, kernel_init=_zeros, bias_init=_zeros,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="linear")(x)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep -> MLP embedding (models.py:27-64)."""

    hidden_size: int
    freq_size: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        emb = timestep_embedding(t, self.freq_size).astype(self.dtype)
        emb = nn.Dense(self.hidden_size, kernel_init=_normal02, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.hidden_size, kernel_init=_normal02, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(emb)


class DiT(nn.Module):
    """Dual-headed DiT for jigsaw diffusion.

    __call__(x, t, code):
      x:    (B, H, W, C)  scrambled image (conditioning), NHWC
      t:    (B,)          original-chain timestep indices (0..999)
      code: (B, N, code_dim) noisy per-token positional code
    returns (image_out (B, H, W, C_out), code_out (B, N, code_dim))
    """

    config: DiTConfig

    @nn.compact
    def __call__(self, x, t, code, x_is_tokens: bool = False):
        cfg = self.config
        dt = cfg.dtype

        if x_is_tokens:
            # x is a precomputed condition embedding (B, N, hidden) from
            # :func:`embed_condition` — the conditioning image is constant
            # across all sampler steps, so hoisting its patch embedding out
            # of the reverse-diffusion scan removes loop-invariant work.
            x = x.astype(dt)
        else:
            # Patch embed: exact conv-as-matmul (stride == kernel).
            x = nn.Dense(cfg.hidden_size, kernel_init=_xavier, dtype=dt,
                         param_dtype=cfg.param_dtype,
                         name="x_embedder")(patchify(x.astype(dt), cfg))
            pos = jnp.asarray(get_2d_sincos_pos_embed(
                cfg.hidden_size, cfg.tokens_per_side), dtype=dt)
            x = x + pos[None]

        code_emb = nn.Dense(cfg.hidden_size, kernel_init=_normal02, dtype=dt,
                            param_dtype=cfg.param_dtype, name="code_in")(code.astype(dt))
        b = x.shape[0]
        x = x + code_emb

        c = TimestepEmbedder(cfg.hidden_size, dtype=dt,
                             param_dtype=cfg.param_dtype, name="t_embedder")(t)

        from ..ops.quant import parse_quant_spec

        # "int8" quantizes every block; "int8:K" only the first K — the
        # late blocks feed the 8-dim code regression, where int8 noise is
        # what costs large-grid puzzle accuracy (ops/quant.py docstring).
        qmode, qlimit = parse_quant_spec(cfg.quant)
        for i in range(cfg.depth):
            x = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                         dtype=dt, param_dtype=cfg.param_dtype,
                         attn_impl=cfg.attn_impl,
                         quant=qmode if (qlimit is None or i < qlimit)
                         else None,
                         moe_experts=cfg.moe_experts,
                         moe_capacity=cfg.moe_capacity,
                         seq_mesh=cfg.seq_mesh,
                         name=f"block_{i}")(x, c)

        x = FinalLayer(cfg.hidden_size, cfg.patch_dim, dtype=dt,
                       param_dtype=cfg.param_dtype, name="final_layer")(x, c)

        # Positional-code head reads the final-layer output, as the
        # reference does (models.py:288-290).
        h = nn.Dense(cfg.code_head_hidden, kernel_init=_normal02, dtype=dt,
                     param_dtype=cfg.param_dtype, name="code_out1")(x)
        code_out = nn.Dense(cfg.code_dim, kernel_init=_normal02, dtype=dt,
                            param_dtype=cfg.param_dtype, name="code_out2")(nn.silu(h))

        # Unpatchify (models.py:227-240), NHWC.
        n_side, p = cfg.tokens_per_side, cfg.patch_size
        img = x.reshape(b, n_side, n_side, p, p, cfg.out_channels)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, cfg.input_size, cfg.input_size, cfg.out_channels)

        return img.astype(jnp.float32), code_out.astype(jnp.float32)


# --------------------------------------------------------------------------
# Config registry — full parity with reference models.py:373-424.
# --------------------------------------------------------------------------

def _cfg(depth, hidden, patch, heads):
    return dict(depth=depth, hidden_size=hidden, patch_size=patch, num_heads=heads)


DIT_CONFIGS: dict[str, dict] = {
    "DiT-XL/2": _cfg(28, 1152, 2, 16), "DiT-XL/4": _cfg(28, 1152, 4, 16),
    "DiT-XL/8": _cfg(28, 1152, 8, 16),
    "DiT-L/2": _cfg(24, 1024, 2, 16), "DiT-L/4": _cfg(24, 1024, 4, 16),
    "DiT-L/8": _cfg(24, 1024, 8, 16),
    "DiT-B/2": _cfg(12, 768, 2, 12), "DiT-B/4": _cfg(12, 768, 4, 12),
    "DiT-B/8": _cfg(12, 768, 8, 12),
    "DiT-S/2": _cfg(12, 384, 2, 6), "DiT-S/4": _cfg(12, 384, 4, 6),
    "DiT-S/8": _cfg(12, 384, 8, 6),
    "JPDVT": _cfg(12, 768, 16, 12),
    "JPDVT-S": _cfg(12, 768, 32, 12),
    "JPDVT-T": _cfg(12, 768, 64, 12),
    # Sparse flagship: 8 expert-choice-routed experts per block MLP
    # (models/moe.py) — 8x the MLP params of the dense flagship while each
    # token is refined by ~2 experts on average (capacity 2.0: E*C = 2N
    # expert-token slots, i.e. ~2x dense MLP FLOPs). Beyond-reference
    # extension; the expert dim shards over the 'ep' mesh axis.
    "JPDVT-MoE": dict(_cfg(12, 768, 16, 12), moe_experts=8),
}


def create_model(name: str, input_size: int, **overrides) -> tuple[DiT, DiTConfig]:
    """Instantiate a registered config (reference DiT_models dict, models.py:418)."""
    if name not in DIT_CONFIGS:
        raise KeyError(f"unknown model {name!r}; choose from {sorted(DIT_CONFIGS)}")
    cfg = DiTConfig(input_size=input_size, **{**DIT_CONFIGS[name], **overrides})
    return DiT(cfg), cfg
