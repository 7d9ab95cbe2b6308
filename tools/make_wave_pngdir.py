"""Generate a directory of wave-regime PNGs for the end-to-end decode
benchmark (PERF.md "pngdir" rows).

The committed pngdir journals exercise the full harness path the
reference's ``inference.py`` takes — decode images from a folder, crop,
scramble, solve, journal (reference anchor: inference.py:197-204 builds
an ImageFolder over a directory). Round 4's journals were produced with
untrained weights (the trained 3x3 checkpoint died with the VM), so their
accuracy columns read chance; this tool lets any round regenerate the
benchmark inputs deterministically and re-run the harness against a
freshly-trained wave checkpoint.

PNG round-trip cost: uint8 quantization is <=1/255 ~ 0.004 against wave
amplitudes of 0.3-1.0 per channel, well under the decision margins of a
trained solve, so folder accuracy matches the device-synthesized stream.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, ".")  # run from the repo root, like the other tools

from jpdvt_mt_ntnu_tpu.data.datasets import SyntheticPuzzles  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out", help="output directory")
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--size", type=int, default=192)
    p.add_argument("--seed", type=int, default=777,
                   help="wave-parameter stream seed (777 = disjoint from "
                        "the training stream and the seed-11 eval journals)")
    a = p.parse_args(argv)
    os.makedirs(a.out, exist_ok=True)
    ds = SyntheticPuzzles(a.size, n=a.n, seed=a.seed, cache=False,
                          cues="waves")
    for i in range(a.n):
        x = ds[i]  # (H, W, 3) float32 in [-1, 1]
        u8 = np.clip((x + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(a.out, f"wave_{i:05d}.png"))
    print(f"wrote {a.n} {a.size}px wave PNGs to {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
