"""Progress-CSV analysis — script replacement for the reference notebooks.

Covers the aggregate stats of ``metrics.ipynb`` (overall puzzle/patch
accuracy, unprocessed count, solve-time histogram + statistics) and the
per-dataset summaries of ``sample_visualize_texrec.ipynb``
(reference: image_model/metrics.ipynb, SURVEY.md §2.1).

Usage:
    python -m jpdvt_mt_ntnu_tpu.tools.metrics_report logs/ \
        [--total-expected 100000] [--grid 3] [--hist out.png]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np
import pandas as pd


def load_journals(path: str) -> pd.DataFrame:
    """Load one CSV or every ``*progress*.csv`` in a directory (merged)."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*progress*.csv")))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no progress CSVs under {path}")
    frames = [pd.read_csv(f) for f in files]
    return pd.concat(frames, ignore_index=True)


def report(df: pd.DataFrame, grid: int = 3,
           total_expected: int = 0) -> dict:
    p = grid * grid
    n = len(df)
    out = {
        "images_processed": n,
        "puzzle_accuracy": float(df["puzzle_correct"].mean()) if n else 0.0,
        "patch_accuracy": float(df["patch_matches"].sum() / (n * p)) if n else 0.0,
        "unprocessed": max(0, total_expected - n) if total_expected else None,
    }
    if "time_s" in df and n:
        t = df["time_s"].astype(float)
        out["time"] = {
            "mean_s": float(t.mean()), "median_s": float(t.median()),
            "p95_s": float(t.quantile(0.95)), "min_s": float(t.min()),
            "max_s": float(t.max()), "total_s": float(t.sum()),
            "puzzles_per_sec": float(n / t.sum()) if t.sum() > 0 else 0.0,
        }
    perfect = df[df["puzzle_correct"] == 1]
    failed = df[df["puzzle_correct"] == 0]
    out["examples"] = {
        "perfect": perfect["filename"].head(5).tolist(),
        "failed": failed["filename"].head(5).tolist(),
    }
    return out


def save_histogram(df: pd.DataFrame, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = df["time_s"].astype(float)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.hist(t, bins=50, color="#5b8def", edgecolor="none")
    ax.set_xlabel("solve time (s)")
    ax.set_ylabel("images")
    ax.set_title(f"solve-time distribution (n={len(t)}, "
                 f"mean={t.mean():.2f}s)")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="progress CSV file or logs directory")
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--total-expected", type=int, default=0)
    ap.add_argument("--hist", default="", help="write time histogram PNG")
    a = ap.parse_args(argv)
    df = load_journals(a.path)
    rep = report(df, a.grid, a.total_expected)
    if a.hist and "time_s" in df:
        save_histogram(df, a.hist)
        rep["histogram"] = a.hist
    print(json.dumps(rep, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
