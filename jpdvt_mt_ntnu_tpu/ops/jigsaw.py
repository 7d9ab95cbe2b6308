"""Device-side jigsaw tensor ops.

The reference scatters einops rearranges through every script (e.g.
image_model/train_JPDVT.py:345-349, inference.py:266-278,
diffusion/gaussian_diffusion.py:754-792). Here they are one tested module of
pure-jnp static reshapes/transposes — everything traces to XLA
reshape/transpose/gather, fully fusible and batchable.

Layout convention: images are **NHWC** (TPU-native), pieces are
``(B, P, h, w, C)`` with ``P = grid**2`` row-major over the grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_pieces(x: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, P, h, w, C), pieces row-major."""
    b, hh, ww, c = x.shape
    h, w = hh // grid, ww // grid
    x = x.reshape(b, grid, h, grid, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * grid, h, w, c)


def from_pieces(p: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(B, P, h, w, C) -> (B, H, W, C)."""
    b, n, h, w, c = p.shape
    p = p.reshape(b, grid, grid, h, w, c).transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(b, grid * h, grid * w, c)


def permute_pieces(p: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Reorder pieces. indices: (P,) shared or (B, P) per-sample.

    ``out[:, k] = p[:, indices[k]]`` — slot k of the output receives piece
    ``indices[k]``, the same convention as the reference's fancy-indexing
    scramble (inference.py:272).
    """
    if indices.ndim == 1:
        return p[:, indices]
    return jnp.take_along_axis(
        p, indices.reshape(indices.shape + (1,) * (p.ndim - 2)), axis=1
    )


def scramble(x: jnp.ndarray, indices: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Permute the grid pieces of an image batch. (B,H,W,C) -> (B,H,W,C)."""
    return from_pieces(permute_pieces(to_pieces(x, grid), indices), grid)


def unscramble(x: jnp.ndarray, pred: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Place scrambled pieces back: piece at slot i goes to slot pred[i].

    Matches the reference reconstruction loop (inference.py:322-326):
    ``reconstructed[pred[i]] = scrambled[i]``, i.e. an inverse-permutation
    gather. pred: (P,) or (B, P).
    """
    inv = jnp.argsort(pred, axis=-1)
    return scramble(x, inv, grid)


def piece_code_to_tokens(code: jnp.ndarray, grid: int, sub: int) -> jnp.ndarray:
    """Broadcast per-piece codes to the model's per-token layout.

    code: (..., P, d) with P = grid**2 row-major; each piece covers a
    ``sub x sub`` block of model tokens. Output (..., N, d) with
    N = (grid*sub)**2 in the token raster order
    ``(p1 h1 p2 w1)`` — exactly the reference's broadcast
    (gaussian_diffusion.py:783-790).
    """
    *lead, p, d = code.shape
    assert p == grid * grid
    c = code.reshape(*lead, grid, grid, 1, 1, d)
    c = jnp.broadcast_to(c, (*lead, grid, grid, sub, sub, d))
    # (p1, p2, h1, w1) -> raster (p1, h1, p2, w1)
    c = jnp.moveaxis(c, -3, -4)  # (..., p1, h1, p2, w1, d)
    return c.reshape(*lead, (grid * sub) ** 2, d)


def tokens_to_piece_code(tokens: jnp.ndarray, grid: int, sub: int) -> jnp.ndarray:
    """Pool per-token codes back to per-piece means.

    tokens: (..., N, d) in raster order -> (..., P, d), mean over each
    piece's ``sub*sub`` tokens (the recovery pooling of inference.py:296-301).
    """
    *lead, n, d = tokens.shape
    assert n == (grid * sub) ** 2
    t = tokens.reshape(*lead, grid, sub, grid, sub, d)
    t = jnp.moveaxis(t, -3, -4)  # (..., grid, grid, sub, sub, d)
    t = t.reshape(*lead, grid * grid, sub * sub, d)
    return t.mean(axis=-2)


def random_permutations(rng: jax.Array, batch: int, n: int,
                        shared: bool = False) -> jnp.ndarray:
    """(B, P) random permutations; one shared permutation if ``shared``.

    The reference uses ONE permutation for the whole training batch
    (gaussian_diffusion.py:756); ``shared=True`` reproduces that,
    ``shared=False`` is the stronger per-sample default.
    """
    if shared:
        perm = jax.random.permutation(rng, n)
        return jnp.broadcast_to(perm, (batch, n))
    return jax.vmap(lambda k: jax.random.permutation(k, n))(jax.random.split(rng, batch))


def random_piece_masks(rng: jax.Array, batch: int, grid: int) -> jnp.ndarray:
    """Per-sample visibility masks over pieces: (B, P) float, 1=visible.

    Per reference gaussian_diffusion.py:763-767: each sample hides
    ``r ~ Uniform{0..grid-1}`` distinct pieces chosen uniformly without
    replacement.
    """
    p = grid * grid
    k_r, k_s = jax.random.split(rng)
    r = jax.random.randint(k_r, (batch,), 0, grid)
    scores = jax.random.uniform(k_s, (batch, p))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    return (ranks >= r[:, None]).astype(jnp.float32)


def piece_mask_to_image(mask: jnp.ndarray, grid: int, piece_px: int,
                        channels: int = 3) -> jnp.ndarray:
    """(B, P) piece mask -> (B, H, W, C) pixel mask."""
    b, p = mask.shape
    m = mask.reshape(b, p, 1, 1, 1)
    m = jnp.broadcast_to(m, (b, p, piece_px, piece_px, channels))
    return from_pieces(m, grid)


def inner_crop_pieces(x: jnp.ndarray, grid: int, crop: int) -> jnp.ndarray:
    """Centre-crop each grid piece and reassemble ("gap" augmentation).

    Port of the ImageNet --crop path (train_JPDVT.py:345-349): e.g.
    288 -> 3x3 pieces of 96 -> centre 64 -> reassembled 192.
    """
    p = to_pieces(x, grid)
    h = p.shape[2]
    off = (h - crop) // 2
    p = p[:, :, off:off + crop, off:off + crop, :]
    return from_pieces(p, grid)
