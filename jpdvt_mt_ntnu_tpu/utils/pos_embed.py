"""Sinusoidal positional / timestep embeddings.

The positional-code tables are the heart of JPDVT: each puzzle piece carries
an 8-dim 2-D sin-cos code, and the diffusion process denoises that code.
Tables are built host-side in float64 numpy for accuracy (matching the
reference's numpy-float64 convention, reference: image_model/models.py:348-366)
and cast once.

Behavioral parity notes (vs reference image_model/models.py):
- ``get_2d_sincos_pos_embed`` reproduces the exact meshgrid order quirk of
  the reference (models.py:325-334): ``np.meshgrid(w, h)`` puts the *w*
  coordinate in ``grid[0]``, and the first half of the embedding encodes it.
- ``timestep_embedding`` places cos first, sin second (models.py:52-56),
  unlike the MAE convention.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1-D sin-cos table: (M,) positions -> (M, embed_dim), sin half first."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """2-D sin-cos table for a ``grid_size x grid_size`` grid.

    Returns (grid_size**2, embed_dim) float64. Row-major over the grid; the
    first ``embed_dim//2`` dims encode the column (w) coordinate and the rest
    the row (h) coordinate, matching reference models.py:319-345 exactly.
    """
    assert embed_dim % 2 == 0
    coords = np.arange(grid_size, dtype=np.float64)
    # Row-major flatten: for token (i, j), w varies fastest.
    w = np.tile(coords, grid_size)          # [0,1,2, 0,1,2, ...]
    h = np.repeat(coords, grid_size)        # [0,0,0, 1,1,1, ...]
    return np.concatenate([_sincos_1d(embed_dim // 2, w), _sincos_1d(embed_dim // 2, h)], axis=1)


def grid_code(code_dim: int, grid_size: int, dtype=np.float32) -> np.ndarray:
    """Canonical per-piece positional code, shape (grid_size**2, code_dim)."""
    return get_2d_sincos_pos_embed(code_dim, grid_size).astype(dtype)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, cos-first.

    t: (N,) possibly-fractional timesteps -> (N, dim).
    Matches reference models.py:40-59 (GLIDE convention).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
