"""End-to-end solver pipeline with an oracle model: accuracy must be 1.0."""

import jax
import jax.numpy as jnp
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.ops import jigsaw
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code


class _OracleModel:
    """Fake model that reads the scramble off the conditioning image.

    We hide the permutation in the image itself: each piece's pixels are
    constant = its original slot id. The 'model' recovers per-token codes
    from those pixels, which is exactly what a perfectly-trained DiT does.
    """

    def __init__(self, cfg, grid):
        self.cfg = cfg
        self.grid = grid
        self.sub = cfg.input_size // (cfg.patch_size * grid)
        self.canon = jnp.asarray(grid_code(cfg.code_dim, grid))

    def apply(self, params, condition, t, code):
        piece_px = condition.shape[1] // self.grid
        pieces = jigsaw.to_pieces(condition, self.grid)
        slot_ids = pieces[:, :, 0, 0, 0].astype(jnp.int32)  # (B, P)
        piece_codes = self.canon[slot_ids]                  # (B, P, d)
        toks = jigsaw.piece_code_to_tokens(piece_codes, self.grid, self.sub)
        del piece_px
        return condition, toks


def _make(grid=3, size=48, mode="faithful", steps="10", method="greedy"):
    _, cfg = create_model("JPDVT", input_size=size, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")
    model = _OracleModel(cfg, grid)
    diff = create_diffusion(steps)
    return PuzzleSolver(model, cfg, diff, grid_size=grid, mode=mode,
                        assignment_method=method), cfg


def _slot_images(b, size, grid):
    """Images whose pieces are filled with their slot index."""
    p = grid * grid
    ids = jnp.arange(p, dtype=jnp.float32).reshape(1, p, 1, 1, 1)
    piece_px = size // grid
    pieces = jnp.broadcast_to(ids, (b, p, piece_px, piece_px, 3))
    return jigsaw.from_pieces(pieces, grid)


def test_oracle_solver_perfect_faithful():
    solver, cfg = _make(mode="faithful")
    x = _slot_images(4, 48, 3)
    res = solver.evaluate(None, x, jax.random.key(0))
    assert res.puzzle_accuracy == 1.0
    assert res.patch_accuracy == 1.0


def test_oracle_solver_perfect_fast_and_hungarian():
    for mode in ("fast",):
        for method in ("greedy", "hungarian"):
            solver, _ = _make(mode=mode, method=method)
            x = _slot_images(3, 48, 3)
            res = solver.evaluate(None, x, jax.random.key(1))
            assert res.puzzle_accuracy == 1.0, (mode, method)


def test_reconstruct_restores_original():
    solver, _ = _make()
    x = _slot_images(2, 48, 3)
    scr, idx = solver.scramble(x, jax.random.key(2))
    pred = solver.solve(None, scr)
    rec = solver.reconstruct(scr, pred)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-6)


def test_solver_data_parallel_over_mesh():
    """Batch-sharded solve over 8 CPU devices == single-device result."""
    from jpdvt_mt_ntnu_tpu.parallel import MeshSpec, make_mesh

    solver_ref, cfg = _make(mode="fast")
    mesh = make_mesh(MeshSpec(data=8, model=1))
    _, cfg2 = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                           num_heads=2, attn_impl="xla")
    solver_dp = PuzzleSolver(_OracleModel(cfg2, 3), cfg2,
                             create_diffusion("10"), grid_size=3,
                             mode="fast", mesh=mesh)
    x = _slot_images(16, 48, 3)
    ref = solver_ref.evaluate(None, x, jax.random.key(4))
    dp = solver_dp.evaluate(None, x, jax.random.key(4))
    np.testing.assert_array_equal(dp.pred, ref.pred)
    assert dp.puzzle_accuracy == 1.0


def test_evaluate_masked_flow():
    solver, cfg = _make(mode="fast")
    x = _slot_images(4, 48, 3)
    # num_masked=0 must reduce to the ordinary perfect evaluation
    res0 = solver.evaluate_masked(None, x, jax.random.key(7), num_masked=0)
    assert res0.puzzle_accuracy == 1.0
    # masking degrades the pixel oracle but still yields valid permutations
    for fill in ("noise", "zero"):
        res2 = solver.evaluate_masked(None, x, jax.random.key(7),
                                      num_masked=2, mask_fill=fill)
        assert res2.pred.shape == (4, 9)
        for row in res2.pred:
            assert sorted(row.tolist()) == list(range(9))
        assert res2.patch_matches.sum() < res0.patch_matches.sum()
    import pytest

    with pytest.raises(ValueError):
        solver.evaluate_masked(None, x, jax.random.key(7), 1, mask_fill="bad")


def test_solver_with_real_dit_runs():
    """Untrained tiny DiT end-to-end: valid permutations, not accuracy."""
    model, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                              num_heads=2, attn_impl="xla")
    params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)),
                        jnp.array([0]), jnp.zeros((1, cfg.num_tokens, 8)))
    diff = create_diffusion("5")
    solver = PuzzleSolver(model, cfg, diff, grid_size=3)
    x = jax.random.normal(jax.random.key(1), (2, 48, 48, 3))
    res = solver.evaluate(params, x, jax.random.key(2))
    for row in res.pred:
        assert sorted(row.tolist()) == list(range(9))


def test_microbatched_solve_identical():
    """lax.map micro-batching (the batch-128 cliff fix, PERF.md r2) must be
    bit-identical to the unchunked solve."""
    _, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")
    model = _OracleModel(cfg, 3)
    diff = create_diffusion("6")
    full = PuzzleSolver(model, cfg, diff, grid_size=3, microbatch=0)
    chunked = PuzzleSolver(model, cfg, diff, grid_size=3, microbatch=2)
    x = _slot_images(6, 48, 3)
    scr, _ = full.scramble(x, jax.random.key(3))
    assert chunked._resolve_microbatch(6) == 2
    assert full._resolve_microbatch(6) == 0
    p_full, d_full = full._solve_codes(None, scr)
    p_chunk, d_chunk = chunked._solve_codes(None, scr)
    np.testing.assert_array_equal(np.asarray(p_full), np.asarray(p_chunk))
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_chunk),
                               rtol=1e-6, atol=1e-6)


def test_microbatch_auto_rules():
    solver, _ = _make()
    assert solver._resolve_microbatch(32) == 0      # not larger than cap
    assert solver._resolve_microbatch(128) == 32    # chunks of 32
    assert solver._resolve_microbatch(100) == 0     # not divisible -> off


def test_hungarian_mesh_sharded_matches_greedy():
    """Round 3: the hungarian path goes through the same mesh-sharded
    placement as greedy (no unsharded side path) and agrees with it on
    unambiguous oracle distances."""
    from jpdvt_mt_ntnu_tpu.parallel import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=8, model=1))
    _, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")
    x = _slot_images(16, 48, 3)
    res = {}
    for method in ("greedy", "hungarian"):
        solver = PuzzleSolver(_OracleModel(cfg, 3), cfg,
                              create_diffusion("10"), grid_size=3,
                              mode="fast", mesh=mesh,
                              assignment_method=method)
        res[method] = solver.evaluate(None, x, jax.random.key(4))
        assert res[method].puzzle_accuracy == 1.0, method
    np.testing.assert_array_equal(res["hungarian"].pred, res["greedy"].pred)
    np.testing.assert_array_equal(res["hungarian"].indices,
                                  res["greedy"].indices)


def test_votes_oracle_perfect_and_mapping_consistent():
    """Re-scramble voting (votes=3): the oracle solves every arrangement
    perfectly, so voting must stay 1.0 — this pins the inverse mapping
    (a wrong argsort/take_along_axis would make the vote distance rows
    disagree and collapse accuracy) for both assignment methods."""
    _, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")
    for method in ("greedy", "hungarian"):
        solver = PuzzleSolver(_OracleModel(cfg, 3), cfg,
                              create_diffusion("5"), grid_size=3,
                              mode="faithful", assignment_method=method,
                              votes=3)
        res = solver.evaluate(None, _slot_images(4, 48, 3),
                              jax.random.key(1))
        assert res.puzzle_accuracy == 1.0, method
        assert res.pred.shape == (4, 9)


def test_votes_rescue_adversarial_arrangement():
    """A model whose distance estimate is corrupted for ONE specific
    arrangement (the base scramble) is rescued by votes=4: the three
    clean vote arrangements outvote the corrupted base distances."""

    class _FlakyOracle(_OracleModel):
        """Oracle that garbles its codes whenever piece 0 sits at slot 0
        (an arrangement-dependent failure, like the measured 20x20
        cliff's field misestimates)."""

        def apply(self, params, condition, t, code):
            cond, toks = super().apply(params, condition, t, code)
            bad = (condition[:, 0, 0, 0] == 0.0)  # slot 0 holds piece 0
            flipped = jnp.flip(toks, axis=1)
            toks = jnp.where(bad[:, None, None], flipped, toks)
            return cond, toks

    _, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")
    model = _FlakyOracle(cfg, 3)
    x = _slot_images(8, 48, 3)
    # identity scramble puts piece 0 at slot 0 -> the base solve garbles.
    # Find an rng whose base scramble triggers the failure for >=1 image
    # by using a fixed key and asserting relative improvement instead.
    base = PuzzleSolver(model, cfg, create_diffusion("5"), grid_size=3,
                        mode="faithful")
    voted = PuzzleSolver(model, cfg, create_diffusion("5"), grid_size=3,
                         mode="faithful", votes=4)
    accs = []
    for k in range(6):
        b = base.evaluate(None, x, jax.random.key(k)).puzzle_accuracy
        v = voted.evaluate(None, x, jax.random.key(k)).puzzle_accuracy
        accs.append((b, v))
    # voting never hurts and strictly rescues at least one garbled batch
    assert all(v >= b for b, v in accs), accs
    assert any(v > b for b, v in accs), accs
