"""Device-side jigsaw ops: roundtrips, permutation semantics, mask stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpdvt_mt_ntnu_tpu.ops import jigsaw


def _img(b=2, size=12, c=3, key=0):
    return jax.random.normal(jax.random.key(key), (b, size, size, c))


def test_pieces_roundtrip():
    x = _img()
    p = jigsaw.to_pieces(x, 3)
    assert p.shape == (2, 9, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(jigsaw.from_pieces(p, 3)), np.asarray(x))


def test_pieces_row_major():
    """Piece k must be the grid cell (k//g, k%g)."""
    size, g = 6, 3
    x = jnp.arange(size * size, dtype=jnp.float32).reshape(1, size, size, 1)
    p = jigsaw.to_pieces(x, g)
    for k in range(9):
        i, j = divmod(k, g)
        np.testing.assert_array_equal(
            np.asarray(p[0, k, :, :, 0]),
            np.asarray(x[0, 2 * i:2 * i + 2, 2 * j:2 * j + 2, 0]))


def test_scramble_matches_fancy_indexing():
    """scramble must equal the reference's pieces[indices] convention."""
    x = _img(1, 12)
    idx = jnp.array([4, 2, 8, 0, 6, 1, 7, 3, 5])
    out = jigsaw.scramble(x, idx, 3)
    p = jigsaw.to_pieces(x, 3)
    np.testing.assert_array_equal(
        np.asarray(jigsaw.to_pieces(out, 3)), np.asarray(p[:, idx]))


def test_unscramble_inverts_scramble_via_truth():
    """If pred == indices (perfect model), unscramble restores the original."""
    x = _img(3, 24)
    idx = jax.vmap(lambda k: jax.random.permutation(k, 9))(
        jax.random.split(jax.random.key(5), 3))
    scr = jigsaw.scramble(x, idx, 3)
    rec = jigsaw.unscramble(scr, idx, 3)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-6)


def test_code_broadcast_layout():
    """Token raster order must be (p1 h1 p2 w1) — reference gd.py:786-790."""
    g, sub = 3, 2
    code = jnp.arange(9, dtype=jnp.float32).reshape(1, 9, 1)
    tok = jigsaw.piece_code_to_tokens(code, g, sub)  # (1, 36, 1)
    tok = np.asarray(tok).reshape(6, 6)
    # Token grid row r, col c belongs to piece (r//sub, c//sub).
    for r in range(6):
        for c in range(6):
            assert tok[r, c] == (r // sub) * g + (c // sub)


def test_code_pool_inverts_broadcast():
    g, sub = 3, 4
    code = jax.random.normal(jax.random.key(1), (2, 9, 8))
    tok = jigsaw.piece_code_to_tokens(code, g, sub)
    back = jigsaw.tokens_to_piece_code(tok, g, sub)
    np.testing.assert_allclose(np.asarray(back), np.asarray(code), rtol=1e-6)


def test_random_piece_masks_distribution():
    masks = jigsaw.random_piece_masks(jax.random.key(0), 512, 3)
    hidden = 9 - np.asarray(masks).sum(-1)
    assert hidden.min() >= 0 and hidden.max() <= 2  # r in {0, 1, 2}
    assert (hidden == 0).any() and (hidden == 2).any()


def test_shared_vs_per_sample_perms():
    shared = jigsaw.random_permutations(jax.random.key(0), 4, 9, shared=True)
    assert (np.asarray(shared) == np.asarray(shared)[0]).all()
    per = jigsaw.random_permutations(jax.random.key(0), 64, 9, shared=False)
    assert len({tuple(r) for r in np.asarray(per)}) > 1


@pytest.mark.parametrize("grid,sub", [(2, 3), (3, 2), (4, 1), (5, 2),
                                      (6, 2), (8, 1), (12, 1), (16, 1)])
def test_arbitrary_grid_roundtrips(grid, sub):
    """Every jigsaw op is grid-parameterized (the reference hard-codes 3
    and 4); pin piece/scramble/code roundtrips for grids the reference
    never supports, including the trained 6x6/8x8 geometries."""
    n = grid * grid
    x = _img(2, grid * 4, key=grid)
    p = jigsaw.to_pieces(x, grid)
    assert p.shape == (2, n, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(jigsaw.from_pieces(p, grid)),
                                  np.asarray(x))
    idx = jax.vmap(lambda k: jax.random.permutation(k, n))(
        jax.random.split(jax.random.key(7 + grid), 2))
    rec = jigsaw.unscramble(jigsaw.scramble(x, idx, grid), idx, grid)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-6)
    code = jax.random.normal(jax.random.key(2), (2, n, 8))
    back = jigsaw.tokens_to_piece_code(
        jigsaw.piece_code_to_tokens(code, grid, sub), grid, sub)
    np.testing.assert_allclose(np.asarray(back), np.asarray(code), rtol=1e-6)


def test_inner_crop_pieces():
    x = _img(1, 288)
    out = jigsaw.inner_crop_pieces(x, 3, 64)
    assert out.shape == (1, 192, 192, 3)
    # centre crop of piece (0,0): rows 16..80 of the original
    np.testing.assert_array_equal(
        np.asarray(out[0, :64, :64]), np.asarray(x[0, 16:80, 16:80]))
