"""Durable checkpoint export + fresh-process restore smoke.

Training checkpoints live under ``results/`` which does NOT survive VM
recycles — a failure mode that destroyed the rounds-3/4 ladder capstones
(ROADMAP.md). The one thing that *is* durable here is the git repo itself,
so this tool turns the latest Orbax checkpoint of a run into a committable
artifact:

  * EMA params only (the weights eval/serve actually load — run_eval.py
    ``eval.use_ema`` default), bfloat16, as ONE compressed npz in the
    repo's flattened-params format (tools/torch_convert.py), so
    ``eval.checkpoint=<artifact>.npz`` works directly;
  * bfloat16 is stored as uint16 bit patterns under ``<key>__bf16`` (numpy
    cannot self-describe bfloat16); load_npz_params decodes them;
  * the npz is split into parts below git-host blob limits, with a JSON
    manifest carrying sha256 per part + whole, the training step, and the
    full run_config for exact model reconstruction;
  * after exporting, a FRESH python process reassembles the parts, loads
    the params, rebuilds the model from the embedded run_config, and
    fast-solves synthetic puzzles — proving the artifact restores without
    any state from the exporting process.

Reference anchor: the reference's durability story is torch.save of
pickled dicts onto cluster storage (image_model/train_JPDVT.py:408-418)
named like results/.../checkpoints/2850000.pt (inference.py:44); it has no
integrity checks and its large blobs did not survive into the public repo
(.MISSING_LARGE_BLOBS).

Usage:
    # export (writes artifacts/<run>_step<N>.npz.part* + .manifest.json)
    python tools/export_ckpt.py results/waves20_hard/checkpoints --out artifacts/

    # restore smoke / reassembly (what the exporter runs as a subprocess)
    python tools/export_ckpt.py --restore artifacts/<run>_step<N>.manifest.json \
        [--solve-n 2] [--as-npz /tmp/params.npz]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BF16_SUFFIX = "__bf16"


def _sha256(path: str, start: int = 0, length: int | None = None) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        f.seek(start)
        remaining = length
        while True:
            chunk = f.read(min(1 << 20, remaining) if remaining is not None
                           else 1 << 20)
            if not chunk:
                break
            h.update(chunk)
            if remaining is not None:
                remaining -= len(chunk)
                if remaining <= 0:
                    break
    return h.hexdigest()


def export(ckpt_dir: str, out_dir: str, max_part_mb: int) -> str:
    import ml_dtypes
    import orbax.checkpoint as ocp

    from jpdvt_mt_ntnu_tpu.tools.torch_convert import _flatten

    ckpt_dir = os.path.abspath(ckpt_dir)
    run_dir = os.path.dirname(ckpt_dir)
    run_name = os.path.basename(run_dir) or "run"
    run_config_path = os.path.join(run_dir, "run_config.json")
    run_config = {}
    if os.path.exists(run_config_path):
        with open(run_config_path) as f:
            run_config = json.load(f)
    else:
        print(f"WARNING: no run_config.json next to {ckpt_dir}; the "
              "manifest will not be able to rebuild the model for the "
              "restore smoke", file=sys.stderr)

    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    # Template-free restore: we only need the saved tree as host arrays,
    # not a typed TrainState (and no model/optimizer construction).
    restored = mgr.restore(
        step, args=ocp.args.Composite(state=ocp.args.StandardRestore()))
    state = restored["state"]
    ema = state["ema_params"]

    flat = _flatten(ema)
    enc: dict[str, np.ndarray] = {}
    n_params = 0
    for k, v in flat.items():
        n_params += int(v.size)
        if np.issubdtype(v.dtype, np.floating):
            enc[k + BF16_SUFFIX] = np.asarray(
                v, dtype=ml_dtypes.bfloat16).view(np.uint16)
        else:
            enc[k] = v

    os.makedirs(out_dir, exist_ok=True)
    name = f"{run_name}_step{step}"
    with tempfile.TemporaryDirectory() as tmp:
        npz_path = os.path.join(tmp, name + ".npz")
        np.savez_compressed(npz_path, **enc)
        total = os.path.getsize(npz_path)
        part_bytes = max_part_mb * (1 << 20)
        parts = []
        with open(npz_path, "rb") as f:
            idx = 0
            while True:
                chunk = f.read(part_bytes)
                if not chunk:
                    break
                part_name = f"{name}.npz.part{idx:03d}"
                with open(os.path.join(out_dir, part_name), "wb") as pf:
                    pf.write(chunk)
                parts.append({
                    "file": part_name,
                    "bytes": len(chunk),
                    "sha256": hashlib.sha256(chunk).hexdigest(),
                })
                idx += 1
        manifest = {
            "format": 1,
            "name": name,
            "run": run_name,
            "step": int(step),
            "contents": "ema_params",
            "dtype": "bfloat16 (uint16 bits under *__bf16 keys)",
            "param_count": n_params,
            "npz_bytes": total,
            "npz_sha256": _sha256(npz_path),
            "parts": parts,
            "run_config": run_config,
        }
    manifest_path = os.path.join(out_dir, name + ".manifest.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"exported {n_params:,} EMA params @ step {step} -> "
          f"{len(parts)} part(s), {total / (1 << 20):.1f} MiB total\n"
          f"manifest: {manifest_path}")
    return manifest_path


def reassemble(manifest_path: str, out_npz: str) -> dict:
    # Canonical implementation lives in the package so the trainer can
    # warm-start straight from an artifact (train.warm_start=*.manifest.json
    # — jpdvt_mt_ntnu_tpu/tools/torch_convert.py:load_artifact_params).
    from jpdvt_mt_ntnu_tpu.tools.torch_convert import reassemble_artifact

    return reassemble_artifact(manifest_path, out_npz)


def restore_smoke(manifest_path: str, solve_n: int, as_npz: str = "") -> dict:
    """Reassemble + load + rebuild model + solve — the proof the artifact
    is sufficient on its own. Runs on whatever backend the caller set up
    (the exporter invokes it CPU-only in a fresh process)."""
    import jax

    from jpdvt_mt_ntnu_tpu.tools.torch_convert import load_npz_params
    from jpdvt_mt_ntnu_tpu.utils.config import config_from_dict

    tmp_ctx = None
    if as_npz:
        npz_path = as_npz
    else:
        tmp_ctx = tempfile.TemporaryDirectory()
        npz_path = os.path.join(tmp_ctx.name, "params.npz")
    try:
        manifest = reassemble(manifest_path, npz_path)
        params = load_npz_params(npz_path)
        n_leaves = len(jax.tree.leaves(params))
        n_params = sum(int(x.size) for x in jax.tree.leaves(params))
        report = {
            "manifest": os.path.basename(manifest_path),
            "step": manifest["step"],
            "param_leaves": n_leaves,
            "param_count": n_params,
            "integrity": "sha256 ok",
        }
        if n_params != manifest["param_count"]:
            raise ValueError(
                f"param count {n_params} != manifest {manifest['param_count']}")
        if solve_n > 0 and manifest.get("run_config"):
            import jax.numpy as jnp

            from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
            from jpdvt_mt_ntnu_tpu.data.datasets import SyntheticPuzzles
            from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
            from jpdvt_mt_ntnu_tpu.models import create_model
            from jpdvt_mt_ntnu_tpu.ops import jigsaw

            cfg = config_from_dict(manifest["run_config"])
            model, model_cfg = create_model(
                cfg.model.name, cfg.model.image_size,
                **cfg.model.overrides())
            grid = cfg.task.grid_size
            solver = PuzzleSolver(model, model_cfg,
                                  create_diffusion("250"), grid_size=grid,
                                  mode="fast", seed=0)
            ds = SyntheticPuzzles(cfg.model.image_size, n=solve_n, seed=123,
                                  cues=cfg.data.synthetic_cues or None)
            imgs = np.stack([ds[i] for i in range(solve_n)])
            rng = np.random.default_rng(123)
            perms = np.stack(
                [rng.permutation(grid * grid) for _ in range(solve_n)])
            pred = np.asarray(solver.solve(
                params, jigsaw.scramble(jnp.asarray(imgs),
                                        jnp.asarray(perms), grid)))
            valid = bool(
                (np.sort(pred, axis=1) == np.arange(grid * grid)).all())
            if not valid:
                raise ValueError("solver output is not a permutation")
            report.update({
                "solve_n": solve_n,
                "grid_size": grid,
                "pred_valid_permutations": True,
                "puzzle_acc_on_smoke": float(
                    (pred == perms).all(axis=1).mean()),
            })
        return report
    finally:
        if tmp_ctx is not None:
            tmp_ctx.cleanup()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("ckpt_dir", nargs="?", help="orbax checkpoint dir to export")
    p.add_argument("--out", default="artifacts/", help="artifact directory")
    p.add_argument("--max-part-mb", type=int, default=90,
                   help="split the npz into parts of at most this size "
                        "(git-host blob limits)")
    p.add_argument("--restore", default="",
                   help="manifest path: reassemble + verify + solve instead "
                        "of exporting")
    p.add_argument("--as-npz", default="",
                   help="with --restore: keep the reassembled npz here "
                        "(usable as eval.checkpoint=...)")
    p.add_argument("--solve-n", type=int, default=2,
                   help="synthetic puzzles for the restore solve smoke "
                        "(0 = integrity check only)")
    p.add_argument("--no-smoke", action="store_true",
                   help="skip the fresh-process restore smoke after export")
    a = p.parse_args(argv)

    if a.restore:
        report = restore_smoke(a.restore, a.solve_n, a.as_npz)
        print(json.dumps(report, indent=2))
        return 0

    if not a.ckpt_dir:
        p.error("ckpt_dir required (or --restore MANIFEST)")
    manifest_path = export(a.ckpt_dir, a.out, a.max_part_mb)
    if a.no_smoke:
        return 0
    # Fresh-process proof: nothing from this interpreter leaks into the
    # restore. CPU-only + no TPU-relay handshake so it is safe to run
    # while a training job owns the chip. Output goes to a FILE (a filled
    # pipe deadlocks children on this image — ROADMAP.md gotchas).
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    with tempfile.NamedTemporaryFile("w+", suffix=".log", delete=False) as lf:
        code = subprocess.call(
            [sys.executable, os.path.abspath(__file__),
             "--restore", manifest_path, "--solve-n", str(a.solve_n)],
            stdout=lf, stderr=subprocess.STDOUT, env=env, cwd=REPO)
        lf.seek(0)
        output = lf.read()
    os.unlink(lf.name)
    print(output)
    if code != 0:
        print(f"restore smoke FAILED (exit {code})", file=sys.stderr)
        return code
    print("restore smoke passed in a fresh process")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
