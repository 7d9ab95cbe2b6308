"""Int8 quantized matmuls for the solve/serving path.

The reference has no quantization story (fp32/TF32 torch throughout,
reference: image_model/train_JPDVT.py:5-6). On TPU v5e the MXU's int8
path doubles peak throughput over bf16 (394 vs 197 TOP/s), and the
faithful solve is matmul-bound (PERF.md round-3 roofline: 73%
whole-program MFU), so weight+activation int8 on the DiT's large
projections (qkv, attn out, mlp fc1/fc2 — ~85% of block FLOPs) is the
one remaining >1x throughput lever on this hardware.

Scheme — symmetric, scale-only (AQT-style):

- Weights: per-output-channel scale ``s_w = max|w| / 127`` over the
  input dim, ``w_q = round(w / s_w)`` in int8. Computed in-graph from
  the fp32 params; inside the 250-step sampler ``lax.scan`` the params
  are loop-invariant, so XLA's while-loop invariant code motion hoists
  the quantization to one O(d_in * d_out) pass per solve, not per step.
- Activations: dynamic per-token scale ``s_x = max|x| / 127`` over the
  feature dim (zero-guarded), ``x_q = round(x / s_x)``.
- Dot: int8 x int8 -> int32 on the MXU (``preferred_element_type``),
  then ``out = i32 * s_x * s_w + bias`` in the compute dtype.

Why this is safe for THIS model: in faithful mode every sampler step
consumes the original noise (the reference quirk,
gaussian_diffusion.py:522), so per-step quantization error never
compounds across the chain; and the final prediction is an argmin over
Manhattan distances between pooled 8-dim codes, which tolerates small
perturbations. Accuracy is validated end-to-end on the trained
flagships (PERF.md round-3 int8 section) and gated by the same
trained-fixture test as the bf16 path (tests/test_quant.py).

Not quantized: attention score/value matmuls (tiny at N <= 324 and
softmax-sensitive), adaLN modulation (input is (B, hidden) — negligible
FLOPs, zero-init-sensitive), final layer + code head (zero-init, the
8-dim regression output), patch embed (hoisted out of the scan
entirely by eval.solver via models.dit.embed_condition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0


def parse_quant_spec(spec) -> tuple:
    """Parse a quantization spec string -> (mode, depth_limit).

    - ""/None      -> (None, None)          no quantization
    - "int8"       -> ("int8", None)        every block quantized
    - "int8:K"     -> ("int8", K)           only the FIRST K blocks
                                            quantized; the last depth-K
                                            blocks (plus, as always, the
                                            final layer and code head) stay
                                            in the compute dtype.

    Selective depth is the large-grid accuracy rescue (PERF.md round-3
    int8: full int8 reads 0.8906 vs 0.9873 bf16 puzzle acc at 16x16 —
    the 8-dim code regression at the top of the stack is where int8
    noise hurts; the early feature-extraction blocks tolerate it).
    """
    if not spec:
        return None, None
    spec = str(spec)
    if ":" in spec:
        mode, _, k = spec.partition(":")
        try:
            limit = int(k)
        except ValueError:
            raise ValueError(f"bad quant spec {spec!r} (want e.g. 'int8:8')")
    else:
        mode, limit = spec, None
    if mode != "int8":
        raise ValueError(f"unknown quant mode {mode!r} (supported: int8)")
    return mode, limit


def quantize_channelwise(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-output-channel weight quantization.

    w: (d_in, d_out) float. Returns (w_q int8 (d_in, d_out),
    s_w float32 (d_out,)) with w ~= w_q * s_w.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    s_w = jnp.maximum(amax, 1e-30) / _QMAX
    w_q = jnp.clip(jnp.round(w / s_w), -_QMAX, _QMAX).astype(jnp.int8)
    return w_q, s_w


def quantize_rowwise(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 dynamic per-row (per-token) activation quantization.

    x: (..., d) float. Returns (x_q int8, s_x float32 (..., 1)) with
    x ~= x_q * s_x. All-zero rows get scale 1e-30 and quantize to 0.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-30) / _QMAX
    x_q = jnp.clip(jnp.round(xf / s_x), -_QMAX, _QMAX).astype(jnp.int8)
    return x_q, s_x


def int8_matmul(x_q: jnp.ndarray, w_q: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 contraction over the last/first dims.

    On TPU this lowers to the MXU's native int8 path (2x bf16 peak);
    on CPU XLA emulates it, which the correctness tests rely on.
    """
    lhs = x_q.reshape(-1, x_q.shape[-1])
    out = jax.lax.dot_general(
        lhs, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return out.reshape(*x_q.shape[:-1], w_q.shape[-1])


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               out_dtype=None) -> jnp.ndarray:
    """Drop-in quantized replacement for ``x @ kernel + bias``.

    x (..., d_in) in any float dtype; kernel (d_in, d_out) fp32 params;
    bias (d_out,). Output in ``out_dtype`` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    x_q, s_x = quantize_rowwise(x)
    w_q, s_w = quantize_channelwise(kernel)
    acc = int8_matmul(x_q, w_q).astype(jnp.float32)
    out = acc * s_x * s_w + bias.astype(jnp.float32)
    return out.astype(out_dtype)
