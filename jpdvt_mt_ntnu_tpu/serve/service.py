"""Framework-agnostic puzzle service: the reference API's business logic.

One object owns the jitted solver (loaded once at startup, like the
reference's global singletons — reference: api/app.py:115-153) and returns
plain dicts matching the reference JSON contract exactly
(api/app.py:188-248 create_puzzle, :250-348 solve_puzzle, :350-451 solve).
Both the FastAPI app and the stdlib HTTP fallback delegate here, so the
contract is tested independently of the web framework.

Difference from the reference: the reconstructed image is reassembled
seamlessly instead of via torchvision ``make_grid`` (which injects 2px
padding lines between pieces).
"""

from __future__ import annotations

import base64
import dataclasses
import io
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.diffusion import create_diffusion
from ..data import transforms as T
from ..eval.solver import PuzzleSolver
from ..models import create_model
from ..ops import jigsaw


@dataclasses.dataclass
class ServiceConfig:
    model_name: str = "JPDVT"
    checkpoint: str = ""             # npz (converted) or orbax dir; "" = random
    image_size: int = 192
    grid_size: int = 3
    sampling_steps: int = 250
    sampler_mode: str = "faithful"
    seed: int = 0
    compute_dtype: str = "bfloat16"
    # "int8": quantized matmuls on the DiT's large projections
    # (ops/quant.py) — the v5e 2x-peak serving path. Checkpoints are
    # unchanged (quantization is in-graph from the float params).
    quant: str = ""
    # Per-checkpoint quantization gate. Round 4 measured that int8's
    # accuracy cost is CHECKPOINT-specific, not geometric (PERF.md "int8 at
    # 16x16 revisited": 9.7pt collapse on one 16x16 checkpoint, 1.0pt on
    # another — same geometry, same code), so a quantized service must
    # validate the loaded weights, not rely on a one-time benchmark. When
    # ``quant`` is set, startup solves ``quant_gate_n`` synthetic wave
    # puzzles with the quantized model AND a non-quantized twin (same
    # params; quantization is in-graph) and compares predicted
    # permutations: patch disagreement above ``quant_gate_tol`` refuses to
    # serve ("strict"), logs a warning ("warn"), or is skipped ("off").
    # Fast-mode solves are used for both: the solve is decided by the x0
    # prediction, which fast mode preserves exactly (PERF.md sampler
    # invariance), so the gate costs two small batch solves, not two
    # 250-step chains.
    quant_gate: str = "strict"        # strict | warn | off
    quant_gate_n: int = 32
    quant_gate_tol: float = 0.02
    # Request micro-batching: >0 enables a MicroBatcher that stacks
    # concurrent solve requests arriving within this window into ONE padded
    # device batch (see serve/plugins.py). 0 = one program per request.
    batch_window_ms: float = 0.0
    batch_max: int = 8
    # scaled-down overrides for tests
    depth: int = 0
    hidden_size: int = 0
    num_heads: int = 0
    # Request gate (serve/gate.py): optional API-key auth + per-client rate
    # limiting on the mutating /api POSTs, enforced identically by both
    # transports. Defaults come from the environment so a deployment can be
    # locked down without code; empty/0 = open (reference-compatible,
    # api/app.py:49-55 has no auth at all).
    api_key: str = dataclasses.field(
        default_factory=lambda: os.environ.get("JPDVT_API_KEY", ""))
    rate_limit: float = dataclasses.field(
        default_factory=lambda: float(
            os.environ.get("JPDVT_RATE_LIMIT", "0") or 0.0))
    rate_burst: int = dataclasses.field(
        default_factory=lambda: int(
            os.environ.get("JPDVT_RATE_BURST", "0") or 0))


def _b64_to_image(data: str) -> Image.Image:
    return Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")


def _array_to_b64(arr: np.ndarray) -> str:
    """[-1,1] HWC float -> base64 PNG (api/app.py:87-103 equivalent)."""
    a = (T.denormalize(np.asarray(arr)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("utf-8")


class PuzzleService:
    def __init__(self, cfg: ServiceConfig):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        overrides = {}
        if cfg.depth:
            overrides["depth"] = cfg.depth
        if cfg.hidden_size:
            overrides["hidden_size"] = cfg.hidden_size
        if cfg.num_heads:
            overrides["num_heads"] = cfg.num_heads
        if cfg.quant:
            overrides["quant"] = cfg.quant
        self._dtype = dtype
        self._overrides = overrides
        self.model, self.model_cfg = create_model(
            cfg.model_name, cfg.image_size, dtype=dtype, **overrides)
        self.params = self._load_params()
        diffusion = create_diffusion(str(cfg.sampling_steps))
        self.solver = PuzzleSolver(self.model, self.model_cfg, diffusion,
                                   grid_size=cfg.grid_size,
                                   mode=cfg.sampler_mode, seed=cfg.seed)
        self._rng = np.random.default_rng(cfg.seed)
        self._batchers: dict = {}
        self.quant_gate_report: Optional[dict] = None
        if cfg.quant and cfg.quant_gate != "off":
            self.quant_gate_report = self._run_quant_gate()

    def _run_quant_gate(self) -> dict:
        """int8-vs-bf16 solve agreement on the LOADED checkpoint; see
        ``ServiceConfig.quant_gate``. Returns the report; raises
        RuntimeError in strict mode when disagreement exceeds tolerance."""
        import logging

        from ..data.datasets import SyntheticPuzzles

        cfg = self.cfg
        base = {k: v for k, v in self._overrides.items() if k != "quant"}
        ref_model, ref_cfg = create_model(
            cfg.model_name, cfg.image_size, dtype=self._dtype, **base)
        diffusion = self.solver.diffusion
        q_solver = (self.solver if self.solver.mode == "fast" else
                    PuzzleSolver(self.model, self.model_cfg, diffusion,
                                 grid_size=cfg.grid_size, mode="fast",
                                 seed=cfg.seed))
        b_solver = PuzzleSolver(ref_model, ref_cfg, diffusion,
                                grid_size=cfg.grid_size, mode="fast",
                                seed=cfg.seed)
        n, p = cfg.quant_gate_n, cfg.grid_size ** 2
        ds = SyntheticPuzzles(cfg.image_size, n=n, seed=20_240_814,
                              cache=False, cues="waves")
        imgs = np.stack([ds[i] for i in range(n)])
        rng = np.random.default_rng(20_240_814)
        perms = np.stack([rng.permutation(p) for _ in range(n)])
        scrambled = jigsaw.scramble(jnp.asarray(imgs), jnp.asarray(perms),
                                    cfg.grid_size)
        pred_q = q_solver.solve(self.params, scrambled)
        pred_b = b_solver.solve(self.params, scrambled)
        patch_dis = float((pred_q != pred_b).mean())
        puzzle_dis = float((pred_q != pred_b).any(axis=1).mean())
        report = {
            "quant": cfg.quant, "n": n, "grid_size": cfg.grid_size,
            "patch_disagreement": patch_dis,
            "puzzle_disagreement": puzzle_dis,
            "tol": cfg.quant_gate_tol, "mode": cfg.quant_gate,
            "passed": patch_dis <= cfg.quant_gate_tol,
        }
        if not report["passed"]:
            msg = (f"quant gate: {cfg.quant} disagrees with the unquantized "
                   f"solve on {patch_dis:.1%} of patches "
                   f"({puzzle_dis:.1%} of {n} puzzles) for THIS checkpoint "
                   f"— above tol {cfg.quant_gate_tol:.1%}. Quantization "
                   f"tolerance is checkpoint-specific (PERF.md round 4); "
                   f"serve bf16, or set quant_gate='warn'/'off' to "
                   f"override.")
            if cfg.quant_gate == "strict":
                raise RuntimeError(msg)
            logging.getLogger("jpdvt.serve").warning(msg)
        return report

    def _load_params(self):
        cfg, m = self.cfg, self.model_cfg
        if cfg.checkpoint.endswith(".npz"):
            from ..tools.torch_convert import load_npz_params

            return jax.tree.map(jnp.asarray, load_npz_params(cfg.checkpoint))
        if cfg.checkpoint:
            from ..train import CheckpointManager, create_train_state
            from ..train.state import make_optimizer

            mgr = CheckpointManager(cfg.checkpoint)
            tmpl = create_train_state(self.model, m, jax.random.key(0),
                                      make_optimizer())
            return mgr.restore(tmpl).ema_params
        return self.model.init(
            jax.random.key(0),
            jnp.zeros((1, m.input_size, m.input_size, 3)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, m.num_tokens, m.code_dim)))

    # ------------------------------------------------------------ endpoints

    def models(self) -> list[dict]:
        """GET /api/models: built-ins + every registered plugin
        (api/app.py:172-186; the plugin rows are the FCViT-family analog,
        api/app.py:453-552)."""
        from .plugins import list_solvers

        default = {"id": "default", "name": self.cfg.model_name,
                   "description": f"{self.cfg.grid_size}x{self.cfg.grid_size} "
                                  "Grid Jigsaw Puzzle Solver"}
        if self.cfg.quant:
            # Quantized deployments surface their startup gate verdict so
            # operators can see agreement-vs-float without reading logs
            # (the gate exists because int8 cost is checkpoint-specific).
            default["quant"] = self.cfg.quant
            default["quant_gate"] = self.quant_gate_report
        return [
            default,
            {"id": "fast", "name": f"{self.cfg.model_name} (fast)",
             "description": "Mathematically-equivalent single-step solver"},
        ] + [p.info.to_dict() for p in list_solvers()]

    def _prep(self, img: Image.Image) -> np.ndarray:
        img = T.center_crop_arr(img, self.cfg.image_size)
        return T.normalize(T.to_array(img))

    def create_puzzle(self, image_bytes: bytes,
                      seed: Optional[int] = None) -> dict:
        """POST /api/create_puzzle (api/app.py:188-248)."""
        rng = np.random.default_rng(seed) if seed is not None else self._rng
        x = self._prep(Image.open(io.BytesIO(image_bytes)).convert("RGB"))
        p = self.cfg.grid_size ** 2
        indices = rng.permutation(p)
        scrambled = np.asarray(jigsaw.scramble(
            jnp.asarray(x)[None], jnp.asarray(indices), self.cfg.grid_size))[0]
        patch_matches = int((indices == np.arange(p)).sum())
        return {
            "original_image": _array_to_b64(x),
            "puzzle_image": _array_to_b64(scrambled),
            "indices": indices.tolist(),
            "initial_metrics": {
                "patch_matches": patch_matches,
                "total_patches": p,
                "patch_accuracy": patch_matches / p,
            },
        }

    def _solve_scrambled(self, scrambled: np.ndarray, mode_id: str):
        from .plugins import MicroBatcher, get_solver

        plugin = get_solver(mode_id)
        if plugin is not None:
            return plugin.solve_batch(np.asarray(scrambled)[None])[0], self.solver

        solver = self.solver
        if mode_id == "fast" and solver.mode != "fast":
            # fast mode produces identical outputs; reuse the same solver
            # params but a one-step program
            if not hasattr(self, "_fast_solver"):
                self._fast_solver = PuzzleSolver(
                    self.model, self.model_cfg, solver.diffusion,
                    grid_size=self.cfg.grid_size, mode="fast",
                    seed=self.cfg.seed)
            solver = self._fast_solver
        elif mode_id not in ("default", "fast"):
            raise ValueError(f"unknown model_id {mode_id!r}; "
                             f"see GET /api/models")
        if self.cfg.batch_window_ms > 0:
            key = solver.mode
            if key not in self._batchers:
                self._batchers[key] = MicroBatcher(
                    lambda xs, s=solver: s.solve(self.params,
                                                 jnp.asarray(xs)),
                    max_batch=self.cfg.batch_max,
                    window_ms=self.cfg.batch_window_ms)
            pred = self._batchers[key].solve(scrambled)
        else:
            pred = solver.solve(self.params, jnp.asarray(scrambled)[None])[0]
        return pred, solver

    def solve_puzzle(self, image_bytes: bytes, model_id: str = "default") -> dict:
        """POST /api/solve_puzzle: scramble + solve (api/app.py:250-348)."""
        x = self._prep(Image.open(io.BytesIO(image_bytes)).convert("RGB"))
        p = self.cfg.grid_size ** 2
        indices = self._rng.permutation(p)
        scrambled = np.asarray(jigsaw.scramble(
            jnp.asarray(x)[None], jnp.asarray(indices), self.cfg.grid_size))[0]
        pred, solver = self._solve_scrambled(scrambled, model_id)
        recon = np.asarray(solver.reconstruct(
            jnp.asarray(scrambled)[None], pred[None]))[0]
        patch_matches = int((pred == indices).sum())
        return {
            "success": True,
            "original_image": _array_to_b64(x),
            "scrambled_image": _array_to_b64(scrambled),
            "solution_image": _array_to_b64(recon),
            "metrics": {
                "puzzle_correct": int((pred == indices).all()),
                "patch_matches": patch_matches,
                "total_patches": p,
                "patch_accuracy": patch_matches / p,
            },
            "details": {
                "indices": indices.tolist(),
                "predicted_order": pred.tolist(),
            },
        }

    def solve(self, image_data: str, indices: Optional[list[int]] = None,
              model_id: str = "default") -> dict:
        """POST /api/solve: client sends scrambled b64 + ground-truth indices
        (api/app.py:350-451)."""
        start = time.time()
        x_scrambled = self._prep(_b64_to_image(image_data))
        pred, solver = self._solve_scrambled(x_scrambled, model_id)
        recon = np.asarray(solver.reconstruct(
            jnp.asarray(x_scrambled)[None], pred[None]))[0]
        p = self.cfg.grid_size ** 2
        if indices is not None:
            original = np.asarray(indices)
            puzzle_correct = int((pred == original).all())
            patch_matches = int((pred == original).sum())
        else:
            puzzle_correct, patch_matches = 0, 0
        size = self.cfg.image_size
        g = self.cfg.grid_size
        return {
            "success": True,
            "solution_image": _array_to_b64(recon),
            "predicted_order": pred.tolist(),
            "metrics": {
                "puzzle_correct": puzzle_correct,
                "patch_matches": patch_matches,
                "total_patches": p,
                "patch_accuracy": patch_matches / p,
            },
            "image_info": {
                "grid_size": f"{g}x{g}",
                "image_resolution": f"{size}x{size}",
                "patch_size": f"{size // g}x{size // g}",
            },
            "processing_time": round(time.time() - start, 2),
        }
