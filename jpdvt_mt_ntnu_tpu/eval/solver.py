"""Batched jigsaw solver: scramble -> diffuse -> recover -> metrics.

The reference solves puzzles one image at a time in Python
(reference: image_model/inference.py:249-365, ~1.25 s/img on the cluster
GPU). Here the ENTIRE pipeline — scramble, the 250-step reverse diffusion,
code pooling, Manhattan distances, greedy assignment, metrics — is one
jitted XLA program over a whole batch. Throughput comes from (a) whole-loop
``lax.scan``, (b) large batches over 144-token sequences, (c) optional bf16,
(d) data-parallel sharding over the mesh (SURVEY.md §7.3 item 5).

Faithfulness notes:
- The noise template is created ONCE and reused for every puzzle, exactly
  like the reference (inference.py:221-222 creates ``time_emb_noise`` once).
- Default sampler mode is "faithful" (the parity target); "fast" is the
  mathematically-equivalent 1-step shortcut; "iterative"/"ddim" are the
  corrected chains.
- The reference runs the model in train() mode at inference
  (inference.py:213-214, "BATCH_NORM_TRAIN_MODE"); the DiT has no dropout
  or batch-norm, so train/eval are identical — our apply is deterministic,
  which reproduces that behavior rather than "fixing" it silently.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import Diffusion
from ..ops import assignment, jigsaw
from ..utils.pos_embed import grid_code


@dataclasses.dataclass
class SolveResult:
    pred: np.ndarray            # (B, P) predicted slot per scrambled piece
    indices: np.ndarray         # (B, P) ground-truth scramble
    puzzle_correct: np.ndarray  # (B,) int
    patch_matches: np.ndarray   # (B,) int

    @property
    def puzzle_accuracy(self) -> float:
        return float(self.puzzle_correct.mean())

    @property
    def patch_accuracy(self) -> float:
        return float(self.patch_matches.mean() / self.pred.shape[-1])


class PuzzleSolver:
    """Owns the jitted solve program for one (model, grid, steps) config."""

    def __init__(self, model, model_config, diffusion: Diffusion, *,
                 grid_size: int = 3, mode: str = "faithful",
                 assignment_method: str = "greedy", seed: int = 0,
                 donate_condition: bool = False, mesh=None,
                 microbatch: Optional[int] = None, votes: int = 1):
        cfg = model_config
        self.model = model
        self.cfg = cfg
        self.diffusion = diffusion
        self.grid = grid_size
        self.mode = mode
        self.assignment_method = assignment_method
        self.sub = cfg.input_size // (cfg.patch_size * grid_size)
        if self.sub < 1:
            raise ValueError("grid finer than model tokens")
        self.canon = jnp.asarray(grid_code(cfg.code_dim, grid_size))
        # Fixed noise template, one per solver (inference.py:221-222).
        self.noise_template = jax.random.normal(
            jax.random.key(seed), (1, cfg.num_tokens, cfg.code_dim))
        self._rng = jax.random.key(seed + 1)

        # Optional multi-device data parallelism: with a mesh, batches are
        # sharded over the 'data' axis before the jitted programs run and
        # XLA partitions the whole solve (the DataParallel/DDP-inference
        # replacement, SURVEY.md §2.2).
        self.mesh = mesh
        # Per-device micro-batch cap. XLA's per-step solve program is most
        # efficient around batch 32 on v5e; above that, fusion tiling
        # degrades and per-image cost rises ~50% by batch 128 (PERF.md r2:
        # 15.2 -> 22.9 puzzles/s restored by chunking). Large batches are
        # split into micro-batches run sequentially by one lax.map — same
        # compiled step program, full throughput at any batch size.
        # None = auto (32 per data shard); 0 = never chunk.
        self.microbatch = microbatch
        # Test-time re-scramble voting (votes > 1): the solve is
        # deterministic (fixed noise template), so augmentation comes from
        # solving the SAME puzzle under `votes` different piece
        # arrangements and averaging the mapped-back distance matrices
        # before the single assignment. Attacks arrangement-dependent
        # field misestimates (PERF.md round-4 "20x20 plateau").
        self.votes = int(votes)
        donate = (1,) if donate_condition else ()
        self._solve_codes = jax.jit(self._solve_codes_impl, donate_argnums=donate)
        self._solve_and_score = jax.jit(self._solve_and_score_impl)
        self._solve_and_score_votes = jax.jit(self._solve_and_score_votes_impl)
        self._scramble = jax.jit(self._scramble_impl)

    # ------------------------------------------------------------- programs

    def _model_fn(self, params, precomputed_tokens: bool = False):
        if precomputed_tokens:
            def fn(condition_tokens, t_orig, code):
                return self.model.apply(params, condition_tokens, t_orig,
                                        code, x_is_tokens=True)
            return fn

        def fn(condition, t_orig, code):
            return self.model.apply(params, condition, t_orig, code)
        return fn

    def _resolve_microbatch(self, b: int) -> int:
        """Effective micro-batch for a batch of ``b`` (0 = don't chunk)."""
        mb = self.microbatch
        if mb is None:
            # Chunking helps the single-step fast mode too (measured
            # back-to-back at B=128: 4731 vs 3709 puzzles/s).
            mb = 32 * (self.mesh.shape["data"] if self.mesh is not None else 1)
        if not mb or b <= mb or b % mb:
            return 0
        return mb

    def _cast_params(self, params):
        """Pre-cast fp32 param leaves to the compute dtype ONCE per solve.

        Every in-model parameter use already does ``.astype(compute_dtype)``,
        but those converts sit inside the 250-step sampler scan body; when
        XLA declines to hoist them out of the while loop, the flagship pays
        ~786 MB/step of HBM traffic (read 524 MB fp32 + write 262 MB bf16)
        just re-casting 131M params. Casting here — inside the jit, outside
        the scan — makes the loop body consume bf16 params directly and is
        output-identical for every built-in attention impl except "block",
        whose biases were kept fp32 in-kernel (they now round through bf16).

        Measured neutral on the current backend (22.3 puzzles/s either way;
        the round-3 device profile shows XLA already hoists loop-invariant
        converts out of the while body) — kept as zero-cost insurance for
        backends that don't.
        """
        dt = getattr(self.cfg, "dtype", jnp.float32)
        if dt == jnp.float32:
            return params
        return jax.tree.map(
            lambda a: a.astype(dt)
            if getattr(a, "dtype", None) == jnp.float32 else a, params)

    def _solve_codes_impl(self, params, x_scrambled):
        params = self._cast_params(params)
        b = x_scrambled.shape[0]
        mb = self._resolve_microbatch(b)
        if mb:
            xs = x_scrambled.reshape(b // mb, mb, *x_scrambled.shape[1:])
            pred, dist = jax.lax.map(
                lambda xc: self._solve_codes_chunk(params, xc), xs)
            return (pred.reshape(b, *pred.shape[2:]),
                    dist.reshape(b, *dist.shape[2:]))
        return self._solve_codes_chunk(params, x_scrambled)

    def _solve_codes_chunk(self, params, x_scrambled):
        from ..models.dit import DiT, embed_condition

        b = x_scrambled.shape[0]
        noise = jnp.broadcast_to(
            self.noise_template, (b,) + self.noise_template.shape[1:])
        # The condition is constant across sampler steps — for a real DiT,
        # hoist its patch embedding out of the scan (profiled 10-15%/step).
        if isinstance(self.model, DiT):
            condition = embed_condition(params, x_scrambled, self.cfg)
            model_fn = self._model_fn(params, precomputed_tokens=True)
        else:
            condition = x_scrambled
            model_fn = self._model_fn(params)
        if self.mode == "ddim":
            final = self.diffusion.ddim_sample_loop(
                model_fn, condition, noise, self._rng,
                eta=0.0, clip_denoised=False)
        else:
            final = self.diffusion.p_sample_loop(
                model_fn, condition, noise, self._rng,
                mode=self.mode, clip_denoised=False)
        pieces = jigsaw.tokens_to_piece_code(final, self.grid, self.sub)
        dist = assignment.manhattan_distances(pieces, self.canon)
        pred = assignment.greedy_permutation(dist)
        return pred, dist

    def _scramble_impl(self, x, indices):
        return jigsaw.scramble(x, indices, self.grid)

    def _solve_and_score_impl(self, params, x, indices):
        x_scr = jigsaw.scramble(x, indices, self.grid)
        pred, dist = self._solve_codes_impl(params, x_scr)
        puzzle, patch = assignment.permutation_metrics(pred, indices)
        return pred, puzzle, patch, dist

    def _solve_and_score_votes_impl(self, params, x, indices, sigmas):
        """Re-scramble-augmented solve: one solve of the base arrangement
        plus one per extra arrangement ``sigmas[v]`` (applied ON TOP of the
        base scramble), distance rows mapped back to base-scramble piece
        order and averaged; ONE assignment on the averaged distances.

        Mapping: vote image slot j' holds base-scramble piece sigma[j'],
        so mapped[i] = dist_v[argsort(sigma)[i]] restores row i = base
        piece i. The vote loop unrolls (votes is small and static).
        """
        x_scr = jigsaw.scramble(x, indices, self.grid)
        _, dist = self._solve_codes_impl(params, x_scr)
        total = dist.astype(jnp.float32)
        for v in range(sigmas.shape[0]):
            sv = sigmas[v]
            _, dv = self._solve_codes_impl(
                params, jigsaw.scramble(x_scr, sv, self.grid))
            inv = jnp.argsort(sv, axis=-1)
            total = total + jnp.take_along_axis(
                dv.astype(jnp.float32), inv[..., None], axis=1)
        avg = total / (1 + sigmas.shape[0])
        pred = assignment.greedy_permutation(avg)
        puzzle, patch = assignment.permutation_metrics(pred, indices)
        return pred, puzzle, patch, avg

    # ------------------------------------------------------------------ API

    def _place(self, *arrays):
        """Shard batch dims over the mesh's 'data' axis when configured."""
        if self.mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from ..parallel.sharding import batch_sharding

        out = tuple(jax.device_put(a, batch_sharding(self.mesh, a.ndim))
                    for a in arrays)
        return out if len(out) > 1 else out[0]

    def scramble(self, x: jnp.ndarray, rng: jax.Array):
        """Random per-image scramble. x: (B,H,W,C) -> (scrambled, indices)."""
        p = self.grid * self.grid
        indices = jigsaw.random_permutations(rng, x.shape[0], p)
        return self._scramble(x, indices), indices

    def solve(self, params, x_scrambled: jnp.ndarray) -> np.ndarray:
        """Predict slot-per-piece for scrambled images. -> (B, P) int."""
        pred, dist = self._solve_codes(params, self._place(x_scrambled))
        if self.assignment_method == "hungarian":
            from ..ops import native

            return np.asarray(native.hungarian_permutation(np.asarray(dist)),
                              dtype=np.int64)
        return np.asarray(pred)

    def evaluate_async(self, params, x: jnp.ndarray, rng: jax.Array):
        """Dispatch one scramble+solve+score program and return a thunk.

        The jit call returns unmaterialized device arrays immediately (JAX
        async dispatch); calling the thunk blocks on the D2H transfer and
        builds the SolveResult. This lets a caller keep the device queue
        full — dispatch batch N+1 before materializing batch N (the eval
        harness does exactly that; PERF.md round-4 "eval harness").

        Both assignment methods run the SAME device program; hungarian
        additionally pulls the distance tensor in the one bundled
        device_get (a single transfer — previously a separate scramble
        program plus its own D2H) and runs the batched C++ solver on host
        (reference inference.py:304 runs sklearn per image instead).
        """
        p = self.grid * self.grid
        if self.votes > 1:
            k_ind, k_sig = jax.random.split(rng)
            indices = jigsaw.random_permutations(k_ind, x.shape[0], p)
            sigmas = jigsaw.random_permutations(
                k_sig, (self.votes - 1) * x.shape[0], p).reshape(
                    self.votes - 1, x.shape[0], p)
            x, indices = self._place(x, indices)
            pred, puzzle, patch, dist = self._solve_and_score_votes(
                params, x, indices, sigmas)
        else:
            indices = jigsaw.random_permutations(rng, x.shape[0], p)
            x, indices = self._place(x, indices)
            pred, puzzle, patch, dist = self._solve_and_score(params, x,
                                                              indices)
        if self.assignment_method == "hungarian":
            from ..ops import native

            def result() -> SolveResult:
                d, idx = jax.device_get((dist, indices))
                pr = np.asarray(native.hungarian_permutation(d),
                                dtype=np.int64)
                eq = pr == idx
                return SolveResult(pr, np.asarray(idx),
                                   eq.all(-1).astype(np.int32),
                                   eq.sum(-1).astype(np.int32))
        else:
            def result() -> SolveResult:
                pr, idx, pz, pt = jax.device_get((pred, indices, puzzle,
                                                  patch))
                return SolveResult(np.asarray(pr), np.asarray(idx),
                                   np.asarray(pz), np.asarray(pt))
        return result

    def evaluate(self, params, x: jnp.ndarray, rng: jax.Array) -> SolveResult:
        """Scramble clean images, solve, score (the inference.py main loop)."""
        return self.evaluate_async(params, x, rng)()

    def evaluate_masked(self, params, x: jnp.ndarray, rng: jax.Array,
                        num_masked: int, mask_fill: str = "noise") -> SolveResult:
        """Masked-puzzle evaluation: scramble, hide ``num_masked`` random
        scrambled slots per image, solve, score against the full permutation.

        mask_fill:
        - "noise" (default): holes filled with Gaussian noise — matches the
          masked TRAINING distribution (gaussian_diffusion.py:800 puts
          q-sampled noise in holes). Measured on a mask-trained model:
          98% puzzle accuracy at 1 hidden piece vs 27% with zeros.
        - "zero": black holes — the reference notebook's protocol
          (inference_visualize_missing_patches.ipynb SKIPPED_PATCHES),
          kept for comparison with its reported numbers.
        """
        p = self.grid * self.grid
        k_perm, k_mask, k_fill = jax.random.split(rng, 3)
        indices = jigsaw.random_permutations(k_perm, x.shape[0], p)
        x_scr = self._scramble(x, indices)
        scores = jax.random.uniform(k_mask, (x.shape[0], p))
        ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
        piece_mask = (ranks >= num_masked).astype(x.dtype)
        mask_img = jigsaw.piece_mask_to_image(
            piece_mask, self.grid, x.shape[1] // self.grid, x.shape[-1])
        if mask_fill == "noise":
            fill = jax.random.normal(k_fill, x_scr.shape, x_scr.dtype)
        elif mask_fill == "zero":
            fill = jnp.zeros_like(x_scr)
        else:
            raise ValueError(f"unknown mask_fill {mask_fill!r}")
        x_in = x_scr * mask_img + fill * (1 - mask_img)
        pred = self.solve(params, x_in)
        eq = pred == np.asarray(indices)
        return SolveResult(pred, np.asarray(indices),
                           eq.all(-1).astype(np.int32),
                           eq.sum(-1).astype(np.int32))

    def reconstruct(self, x_scrambled: jnp.ndarray, pred: np.ndarray) -> jnp.ndarray:
        """Re-place pieces by the predicted permutation (inference.py:321-327)."""
        return jigsaw.unscramble(x_scrambled, jnp.asarray(pred), self.grid)
