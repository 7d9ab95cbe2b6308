"""Analytic checks of the sin-cos tables (independent of implementation)."""

import math

import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.utils.pos_embed import (
    get_2d_sincos_pos_embed,
    timestep_embedding,
)


def test_2d_sincos_8_grid3_analytic():
    """Token (row i, col j): first 4 dims encode j (w), last 4 encode i (h);
    each half is [sin(p*w0), sin(p*w1), cos(p*w0), cos(p*w1)] with
    w = [1, 1e-2] (reference models.py:348-366 with embed_dim//2 = 4)."""
    emb = get_2d_sincos_pos_embed(8, 3)
    assert emb.shape == (9, 8)
    omega = np.array([1.0, 1e-2])
    for i in range(3):
        for j in range(3):
            k = i * 3 + j
            expect = np.concatenate([
                np.sin(j * omega), np.cos(j * omega),
                np.sin(i * omega), np.cos(i * omega),
            ])
            np.testing.assert_allclose(emb[k], expect, atol=1e-12, err_msg=f"tok {k}")


def test_2d_sincos_distinct_rows():
    emb = get_2d_sincos_pos_embed(8, 4)
    d = np.abs(emb[:, None] - emb[None]).sum(-1)
    np.fill_diagonal(d, 1.0)
    assert d.min() > 1e-3  # all 16 codes are well separated


def test_timestep_embedding_analytic():
    """cos-first layout with freqs exp(-ln(1e4) * k/half) (models.py:40-59)."""
    t = jnp.array([0.0, 7.0])
    dim = 8
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    np.testing.assert_allclose(emb[0], np.concatenate([np.ones(half), np.zeros(half)]),
                               atol=1e-6)
    np.testing.assert_allclose(emb[1],
                               np.concatenate([np.cos(7 * freqs), np.sin(7 * freqs)]),
                               rtol=1e-5, atol=1e-6)


def test_timestep_embedding_odd_dim():
    emb = np.asarray(timestep_embedding(jnp.array([3.0]), 7))
    assert emb.shape == (1, 7)
    assert emb[0, -1] == 0.0
