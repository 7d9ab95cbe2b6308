"""CLI batch evaluation — the reference's inference*.py family as one tool.

Usage:
    python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
        data.data_path=/data/imagenet/test eval.checkpoint=ckpts/run1 \
        model.image_size=192 task.grid_size=3 eval.batch_size=64

Variants:
    task.grid_size=4 model.name=JPDVT-T model.image_size=256   # inference_4x4
    data.dataset=texmet|met|synthetic                          # dataset evals
    eval.texrec_dirs=1  -> loop subdirectories with per-dir CSVs
                           (inference_texrec.py behavior, '*mask*' excluded)
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from ..core.diffusion import create_diffusion
from ..models import create_model
from ..utils.config import Config, apply_overrides
from .harness import EvalHarness, find_images
from .solver import PuzzleSolver


def check_metadata_compat(metadata: dict, cfg: Config) -> list[str]:
    """Cross-check the eval config against the checkpoint's recorded train
    config; returns human-readable mismatch lines (empty = compatible).

    The reference has no such guard and paid for it: its '4_Fail' run
    evaluated 18,128 ImageNet images with a 3x3-style config against the
    4x4 JPDVT-T checkpoint and journaled 0.0000 puzzle accuracy before
    anyone noticed (reference logs/4_Fail/inference_progress.csv,
    SURVEY.md §6). Model name, image size and grid must match or the
    pooled-code recovery is silently garbage."""
    tcfg = (metadata or {}).get("config") or {}
    tm = tcfg.get("model") or {}
    tt = tcfg.get("task") or {}
    # A multi-grid checkpoint (task.multi_grid="3,4,6") is valid at every
    # grid it trained on.
    trained_grids = [int(g) for g in str(tt.get("multi_grid") or "").split(",")
                     if g] or [tt.get("grid_size")]
    out = []
    for label, trained, using in (
            ("model.name", tm.get("name"), cfg.model.name),
            ("model.image_size", tm.get("image_size"), cfg.model.image_size)):
        if trained is not None and trained != using:
            out.append(f"{label}: checkpoint was trained with {trained!r}, "
                       f"evaluating with {using!r}")
    if trained_grids != [None] and cfg.task.grid_size not in trained_grids:
        out.append(f"task.grid_size: checkpoint was trained with "
                   f"{trained_grids!r}, evaluating with {cfg.task.grid_size!r}")
    return out


def load_params(cfg: Config, model, model_cfg):
    """Load params from an Orbax train checkpoint or a converted-torch npz;
    random init if no checkpoint given.

    Refuses a checkpoint whose recorded train config conflicts with the
    eval config (see ``check_metadata_compat``); override with
    ``eval.allow_mismatch=true`` for deliberate cross-config runs.

    ``eval.use_ema`` selects the EMA weights (default; usually better) vs
    the raw training weights — the reference evaluates the raw 'model'
    entry of its checkpoint dict (inference.py:207-211), i.e.
    ``eval.use_ema=false`` is the strict-parity setting."""
    if not cfg.eval.checkpoint:
        return model.init(jax.random.key(0),
                          jnp.zeros((1, model_cfg.input_size,
                                     model_cfg.input_size, 3)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, model_cfg.num_tokens,
                                     model_cfg.code_dim)))
    path = cfg.eval.checkpoint
    if path.endswith(".npz"):
        from ..tools.torch_convert import load_npz_params

        return load_npz_params(path)
    from ..train import CheckpointManager, create_train_state
    from ..train.state import make_optimizer

    mgr = CheckpointManager(path)
    mismatches = check_metadata_compat(mgr.metadata(), cfg)
    if mismatches:
        msg = ("checkpoint/eval config mismatch:\n  "
               + "\n  ".join(mismatches)
               + "\n(the reference's '4_Fail' run journaled 18k images at "
               "0.0000 accuracy this way; pass eval.allow_mismatch=true "
               "to proceed anyway)")
        if not cfg.eval.allow_mismatch:
            raise SystemExit(msg)
        print(f"WARNING: {msg}", file=sys.stderr)
    tmpl = create_train_state(model, model_cfg, jax.random.key(0),
                              make_optimizer())
    state = mgr.restore(tmpl)
    return state.ema_params if cfg.eval.use_ema else state.params


def build_dataset(cfg: Config):
    from ..data import (ImageFolderDataset, METDataset, SyntheticPuzzles,
                        TEXMETDataset)

    d = cfg.data
    if d.dataset == "met":
        return METDataset(d.data_path, "test")
    if d.dataset == "texmet":
        return TEXMETDataset(d.data_path, "test", cfg.model.image_size)
    if d.dataset == "synthetic":
        return SyntheticPuzzles(cfg.model.image_size, n=1024, seed=cfg.eval.seed,
                                position_cues=d.synthetic_position_cues,
                                cues=d.synthetic_cues or None)
    return ImageFolderDataset(d.data_path, cfg.model.image_size)


def main(argv=None) -> int:
    from ..utils.platform import (apply_matmul_precision, ensure_platform,
                                  init_compilation_cache)

    ensure_platform()
    init_compilation_cache()
    argv = sys.argv[1:] if argv is None else argv
    texrec = any(a.startswith("eval.texrec_dirs") for a in argv)
    argv = [a for a in argv if not a.startswith("eval.texrec_dirs")]
    cfg = apply_overrides(Config(), argv)
    apply_matmul_precision(cfg.model.matmul_precision)
    from ..parallel import maybe_initialize_distributed

    maybe_initialize_distributed(cfg.mesh)

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    attn_impl, seq_mesh = cfg.model.attn_impl, None
    if cfg.mesh.seq > 1:
        # Context-parallel eval: ring attention over a (data, seq) mesh —
        # the axis that engages multiple chips on ONE huge puzzle (batch
        # sharding covers everything else). parallel/sequence.py.
        from ..parallel import MeshSpec, make_mesh

        seq_mesh = make_mesh(MeshSpec(data=cfg.mesh.data, seq=cfg.mesh.seq))
        attn_impl = "ring"
    model, model_cfg = create_model(cfg.model.name, cfg.model.image_size,
                                    dtype=dtype, attn_impl=attn_impl,
                                    seq_mesh=seq_mesh,
                                    **cfg.model.overrides())
    params = load_params(cfg, model, model_cfg)
    diffusion = create_diffusion(str(cfg.diffusion.sampling_steps),
                                 cfg.diffusion.noise_schedule,
                                 cfg.diffusion.predict_xstart,
                                 cfg.diffusion.sigma_small)
    solver = PuzzleSolver(model, model_cfg, diffusion,
                          grid_size=cfg.task.grid_size,
                          mode=cfg.diffusion.sampler_mode,
                          assignment_method=cfg.eval.assignment,
                          seed=cfg.eval.seed, votes=cfg.eval.votes)

    def harness(logs_dir, journal_name="inference_progress.csv"):
        return EvalHarness(
            solver, params, logs_dir=logs_dir,
            batch_size=cfg.eval.batch_size, seed=cfg.eval.seed,
            results_dir=cfg.eval.results_dir if cfg.eval.save_images else None,
            journal_name=journal_name,
            process_index=jax.process_index(),
            process_count=jax.process_count())

    if texrec:
        # Directory-loop mode (inference_texrec.py:232-253): each subdir of
        # data_path gets its own CSV; '*mask*' files excluded; summary at end.
        results = {}
        for sub in sorted(os.listdir(cfg.data.data_path)):
            full = os.path.join(cfg.data.data_path, sub)
            if not os.path.isdir(full):
                continue
            paths = find_images(full, exclude_substr="mask")
            if not paths:
                continue
            h = harness(cfg.eval.logs_dir, f"{sub}_inference_progress.csv")
            results[sub] = h.run_paths(paths, limit=cfg.eval.limit)
        print("==== OVERALL RESULTS ====")
        for sub, r in results.items():
            print(f"{sub}: puzzle={r.puzzle_accuracy:.4f} "
                  f"patch={r.patch_accuracy:.4f} n={r.count}")
        return 0

    h = harness(cfg.eval.logs_dir)
    # data_path set with the default dataset means "evaluate this folder";
    # named datasets (met/texmet) and explicit synthetic take dataset mode.
    folder_mode = bool(cfg.data.data_path) and cfg.data.dataset in (
        "synthetic", "imagenet", "folder")
    if folder_mode:
        paths = find_images(cfg.data.data_path)
        report = h.run_paths(paths, limit=cfg.eval.limit)
    else:
        report = h.run_dataset(build_dataset(cfg), limit=cfg.eval.limit)
    print(f"puzzle_accuracy={report.puzzle_accuracy:.4f} "
          f"patch_accuracy={report.patch_accuracy:.4f} n={report.count} "
          f"({report.puzzles_per_sec:.2f} puzzles/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
