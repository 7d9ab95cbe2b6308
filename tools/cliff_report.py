"""Condition an eval journal's failures on the measured 20x20 hard region.

The round-4 cliff analysis (PERF.md "20x20 plateau") located an
a-priori-identifiable region of wave-draw space — k=2 components,
pairwise orientation gap > 1.2 rad (mod pi), max frequency > 0.85 —
covering ~8.8% of natural draws but carrying ~30% of the puzzle-level
failure rate (vs 3.7% outside). This tool makes that analysis a
first-class, repeatable artifact: given a synthetic-waves eval journal
(run_eval's inference_progress.csv) and the eval seed, it regenerates
each image's wave parameters from the same deterministic stream
(data/datasets.py:_wave_params — seed*1000003+i), classifies every row
in/out of the region, and reports the conditional failure rates. This is
the yardstick for curriculum interventions (data.synthetic_hard_frac)
and test-time voting (eval.votes): a fix works iff the IN-region failure
rate drops without the OUT-region rate rising.

Usage:
  python tools/cliff_report.py logs/waves20_r4_eval/inference_progress.csv \
      --seed 11 [--angle 1.2 --fmax 0.85] [--out logs/.../cliff.json]
"""

import argparse
import csv
import json
import re
import sys

import numpy as np

sys.path.insert(0, ".")


def classify_params(th, f, amp, angle: float, fmax: float):
    """The region predicate, shared by this tool and the tests so the
    oversampler (data.synthetic_hard_frac) and this yardstick cannot
    drift apart silently (ADVICE r4). th/f: (K,), amp: (K, 3) padded
    wave parameters as _wave_params returns them.
    -> (in_hard_region, k, min_pairwise_angle, max_frequency)."""
    k = int(np.count_nonzero(np.any(amp != 0, axis=1)))
    th = np.asarray(th)[:k]
    d = np.abs(th[:, None] - th[None, :])
    d = np.minimum(d, np.pi - d)
    pair = d[np.triu_indices(k, 1)]
    min_angle = float(pair.min()) if pair.size else 0.0
    max_gap = float(pair.max()) if pair.size else 0.0
    fm = float(np.asarray(f)[:k].max())
    hard = (k == 2) and (max_gap > angle) and (fm > fmax)
    return hard, k, min_angle, fm


def classify(i: int, seed: int, angle: float, fmax: float):
    """-> classify_params(...) for natural draw i of the seed's stream
    (hard_frac=0 eval distribution)."""
    from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles

    ds = classify._ds
    if ds is None or ds.seed != seed:
        ds = SyntheticPuzzles(64, n=1, seed=seed, cues="waves")
        classify._ds = ds
    th, f, ph, amp = ds._wave_params(i)
    return classify_params(th, f, amp, angle, fmax)


classify._ds = None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("journal", help="inference_progress.csv from run_eval")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--angle", type=float, default=1.2)
    ap.add_argument("--fmax", type=float, default=0.85)
    ap.add_argument("--grid", type=int, default=0,
                    help="grid size of the run (slots = grid**2). 0 falls "
                         "back to max(patch_matches) with a warning, which "
                         "UNDERCOUNTS misplacements if no row is fully "
                         "solved (ADVICE r4)")
    ap.add_argument("--out", default="", help="write the JSON line here too")
    args = ap.parse_args()

    rows = []
    with open(args.journal) as fh:
        for row in csv.DictReader(fh):
            # Anchored to the synthetic naming (datasets.py image_files =
            # synthetic_%06d.png): a loose (\d+) would match directory
            # digits for path-keyed rows (ADVICE r4). Non-synthetic rows
            # are a usage error, not something to skip silently.
            m = re.search(r"synthetic_(\d+)", row["filename"])
            if not m:
                print(f"row {row['filename']!r} is not a synthetic-waves "
                      f"journal entry; this tool conditions on the "
                      f"regenerated wave draw (seed, index)", file=sys.stderr)
                return 1
            rows.append((int(m.group(1)), int(row["puzzle_correct"]),
                         int(row["patch_matches"])))
    if not rows:
        print("no journal rows", file=sys.stderr)
        return 1

    if args.grid:
        grid_slots = args.grid ** 2
    else:
        grid_slots = max(patches for _, _, patches in rows)
        print(f"warning: --grid not given; assuming {grid_slots} slots "
              f"from max(patch_matches) — wrong for journals with no "
              f"fully-solved puzzle", file=sys.stderr)

    n_in = fail_in = n_out = fail_out = 0
    mis_in = mis_out = 0
    for i, ok, patches in rows:
        hard, k, _, _ = classify(i, args.seed, args.angle, args.fmax)
        mis = grid_slots - patches
        if hard:
            n_in += 1
            fail_in += 1 - ok
            mis_in += mis
        else:
            n_out += 1
            fail_out += 1 - ok
            mis_out += mis

    rep = {
        "journal": args.journal,
        "seed": args.seed,
        "region": {"k": 2, "angle_gt": args.angle, "fmax_gt": args.fmax},
        "grid_slots": grid_slots,
        "n": len(rows),
        "n_in_region": n_in,
        "region_frac": round(n_in / len(rows), 4),
        "fail_rate_in": round(fail_in / max(n_in, 1), 4),
        "fail_rate_out": round(fail_out / max(n_out, 1), 4),
        "puzzle_acc": round(1 - (fail_in + fail_out) / len(rows), 4),
        "misplaced_in": mis_in,
        "misplaced_out": mis_out,
    }
    line = json.dumps(rep)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
