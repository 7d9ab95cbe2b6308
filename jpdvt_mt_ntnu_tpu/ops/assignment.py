"""Permutation recovery: distance matrices + assignment solvers.

The reference recovers the puzzle permutation with sklearn Manhattan
``pairwise_distances`` + a greedy column-argmin loop
(inference.py:113-125,304-306). Here both are pure-jnp, batched with vmap,
and jit-able — the whole batch of P x P problems solves on-device with no
host round-trip. A Hungarian (optimal) solver is provided as a host-side
accuracy-upside variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_KNOCKOUT = 1e9


def manhattan_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., P, d), (P, d) -> (..., P, P): dist[i, j] = ||a_i - b_j||_1."""
    return jnp.abs(a[..., :, None, :] - b[None, :, :]).sum(-1)


def greedy_assignment(dist: jnp.ndarray) -> jnp.ndarray:
    """Greedy column-wise assignment, exact port of reference semantics.

    For each canonical slot j (left to right), pick the remaining piece with
    minimal distance (first index on ties, like np.argmin) and knock it out
    (inference.py:113-125). dist: (P, P) -> order: (P,) int32 where
    ``order[j]`` = piece assigned to slot j.
    """
    p = dist.shape[-1]

    def body(j, state):
        d, order = state
        row = jnp.argmin(d[:, j])
        return d.at[row].set(_KNOCKOUT), order.at[j].set(row)

    _, order = jax.lax.fori_loop(
        0, p, body, (dist.astype(jnp.float32), jnp.zeros((p,), jnp.int32))
    )
    return order


def greedy_permutation(dist: jnp.ndarray) -> jnp.ndarray:
    """dist (..., P, P) -> pred (..., P): slot assigned to each piece.

    ``pred = argsort(order)`` exactly as inference.py:306; batched via vmap.
    """
    fn = greedy_assignment
    for _ in range(dist.ndim - 2):
        fn = jax.vmap(fn)
    return jnp.argsort(fn(dist), axis=-1)


def hungarian_permutation(dist: np.ndarray) -> np.ndarray:
    """Optimal assignment via scipy (host-side). dist (..., P, P) -> (..., P).

    Not part of the parity path — an accuracy-upside option
    (SURVEY.md §7.1 item 5).
    """
    from scipy.optimize import linear_sum_assignment

    dist = np.asarray(dist)
    lead = dist.shape[:-2]
    flat = dist.reshape((-1,) + dist.shape[-2:])
    out = np.empty(flat.shape[:2], dtype=np.int64)
    for i, d in enumerate(flat):
        rows, cols = linear_sum_assignment(d)
        out[i, rows] = cols
    return out.reshape(lead + (dist.shape[-1],))


def permutation_metrics(pred: jnp.ndarray, indices: jnp.ndarray):
    """Puzzle/patch correctness per sample.

    pred, indices: (..., P). Returns (puzzle_correct (...,) int32,
    patch_matches (...,) int32) per reference inference.py:309-314.
    """
    eq = (pred == indices)
    return eq.all(-1).astype(jnp.int32), eq.sum(-1).astype(jnp.int32)
