"""Assignment solvers vs an independent numpy port of the reference greedy."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.ops import assignment


def _reference_greedy(distance_matrix):
    """Straight numpy transcription of inference.py:113-125 semantics."""
    sort_list = []
    tmp = np.copy(distance_matrix)
    for _ in range(tmp.shape[1]):
        order = tmp[:, 0].argmin()
        sort_list.append(order)
        tmp = tmp[:, 1:]
        tmp[order, :] = 1e9
    return sort_list


def test_greedy_matches_reference_random():
    rng = np.random.RandomState(0)
    for _ in range(50):
        d = rng.rand(9, 9).astype(np.float32)
        ref = np.argsort(_reference_greedy(d))
        mine = np.asarray(assignment.greedy_permutation(jnp.asarray(d)))
        np.testing.assert_array_equal(mine, ref)


def test_greedy_batched():
    rng = np.random.RandomState(1)
    d = rng.rand(8, 16, 16).astype(np.float32)
    out = np.asarray(assignment.greedy_permutation(jnp.asarray(d)))
    for i in range(8):
        np.testing.assert_array_equal(out[i], np.argsort(_reference_greedy(d[i])))


def test_manhattan_matches_sklearn():
    from sklearn.metrics import pairwise_distances

    rng = np.random.RandomState(2)
    a = rng.randn(9, 8).astype(np.float32)
    b = rng.randn(9, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(assignment.manhattan_distances(jnp.asarray(a), jnp.asarray(b))),
        pairwise_distances(a, b, metric="manhattan"), rtol=1e-5)


def test_hungarian_optimal():
    d = np.array([[1.0, 2.0, 3.0], [2.0, 4.0, 6.0], [3.0, 6.0, 9.0]])
    pred = assignment.hungarian_permutation(d)
    assert sorted(pred.tolist()) == [0, 1, 2]
    # optimal assignment for this matrix: row0->col2, row1->col1, row2->col0
    assert pred.tolist() == [2, 1, 0]


def test_perfect_codes_recover_permutation():
    """End-to-end recovery: codes == permuted canonical grid -> exact pred."""
    from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

    code = jnp.asarray(grid_code(8, 3))
    idx = jax.vmap(lambda k: jax.random.permutation(k, 9))(
        jax.random.split(jax.random.key(3), 16))
    observed = code[idx]  # (16, 9, 8): piece k carries code of slot idx[k]
    dist = assignment.manhattan_distances(observed, code)
    pred = assignment.greedy_permutation(dist)
    puzzle, patch = assignment.permutation_metrics(pred, idx)
    assert np.asarray(puzzle).all()
    assert (np.asarray(patch) == 9).all()


def test_metrics_partial():
    pred = jnp.array([[0, 1, 2, 3]])
    idx = jnp.array([[0, 1, 3, 2]])
    puzzle, patch = assignment.permutation_metrics(pred, idx)
    assert int(puzzle[0]) == 0 and int(patch[0]) == 2
