"""Puzzle dataset family: MET artworks, TEXMET textiles, generic folders,
and a synthetic set for tests/benchmarks.

TPU-native rework of reference image_model/datasets.py. Datasets return
float32 NHWC arrays in [-1, 1]; all scrambling happens on device.

Behavioral parity:
- MET: seeded deterministic split (test 2000, then val 1000 of the rest,
  random_state 42 — datasets.py:35-36); train aug = resize 398 / random crop
  398 / hflip / color jitter; eval = center crop (datasets.py:49-63); then
  the gapped-collage ``rand_erode`` (datasets.py:73-88). The reference's
  ``list.remove``-while-iterating extension filter bug (datasets.py:30-32)
  is NOT replicated (SURVEY.md §7.4).
- TEXMET: split files ``{split}_files.txt``, missing-file filtering,
  oversize thumbnail, vertical flips, parametric patch size 64/96 for
  192/288, black-image fallback on decode error (datasets.py:106-248).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from . import transforms as T

# Real MET scans exceed PIL's decompression-bomb ceiling (~179M pixels); the
# reference disables the limit globally (datasets.py:16) and so do we —
# without this, the first oversized archive image kills a training run.
Image.MAX_IMAGE_PIXELS = None

_IMG_EXTS = (".jpg", ".jpeg", ".png")


def _split_indices(n: int, seed: int = 42,
                   test_size: int = 2000, val_size: int = 1000):
    """Deterministic shuffle split matching sklearn train_test_split
    (datasets.py:35-36)."""
    from sklearn.model_selection import train_test_split

    idx = list(range(n))
    train, test = train_test_split(idx, test_size=test_size, random_state=seed)
    train, val = train_test_split(train, test_size=val_size, random_state=seed)
    return train, val, test


class _AtomicCounter:
    """GIL-atomic monotonically-increasing counter (itertools.count.next
    is atomic under CPython)."""

    def __init__(self):
        import itertools

        self._c = itertools.count()

    def next(self) -> int:
        return next(self._c)


class _Base:
    image_files: list[str]

    def __len__(self) -> int:
        return len(self.image_files)

    def _load(self, path: str) -> Image.Image:
        return Image.open(path).convert("RGB")


class METDataset(_Base):
    """MET artworks with gapped-collage synthesis (datasets.py:19-104).

    Output: (288, 288, 3) in [-1, 1] — a 3x3 collage of 96px random crops
    taken from 100px regions separated by 48px gaps, simulating eroded
    piece borders.

    Directory contract (verified against reference datasets.py:25-32): the
    archive root holds image subdirectories and exactly THREE of them are
    used. The reference indexes raw ``os.listdir`` order — which is
    filesystem-dependent and therefore irreproducible across hosts; we take
    the three lexicographically-first subdirs so every host builds the same
    file list (and hence the same seed-42 train/val/test split). The
    reference's ``.remove``-while-iterating extension filter bug and its
    substring ``'.jpg' in name`` match are also not replicated: files must
    END in .jpg.
    """

    def __init__(self, image_dir: str, split: str, seed: int = 42):
        self.split = split
        subdirs = sorted(os.listdir(image_dir))[:3]
        files: list[str] = []
        for d in subdirs:
            full = os.path.join(image_dir, d)
            files += [os.path.join(full, k) for k in sorted(os.listdir(full))
                      if k.lower().endswith(".jpg")]
        self.all_files = files
        train, val, test = _split_indices(len(files), seed=seed)
        pick = {"train": train, "val": val, "test": test}[split]
        self.image_files = [files[i] for i in pick]
        self._seed = seed
        self._epoch_salt = _AtomicCounter()

    def __getitem__(self, i: int) -> np.ndarray:
        # Fresh per-call generator: numpy Generators are not thread-safe and
        # the Loader maps __getitem__ over a thread pool. The atomic counter
        # salts repeat visits so augmentations differ across epochs.
        rng = np.random.default_rng((self._seed, i, self._epoch_salt.next()))
        img = self._load(self.image_files[i])
        img = T.resize_shorter(img, 398)
        if self.split == "train":
            img = T.random_crop(img, 398, rng)
            if rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            img = T.color_jitter(img, rng)
        else:
            img = T.center_crop(img, 398)
        arr = T.normalize(T.to_array(img))
        return rand_erode(arr, rng, n=3, patch_out=96, region=100, gap=48)


class TEXMETDataset(_Base):
    """TEXMET textiles (datasets.py:106-248)."""

    def __init__(self, data_dir: str, split: str, image_size: int = 288,
                 seed: int = 0):
        self.split = split
        self.image_size = image_size
        split_file = os.path.join(data_dir, f"{split}_files.txt")
        if not os.path.exists(split_file):
            raise FileNotFoundError(f"Split file not found: {split_file}")
        with open(split_file) as f:
            names = [os.path.basename(line.strip()) for line in f if line.strip()]
        images_dir = os.path.join(data_dir, "images")
        candidates = [os.path.join(images_dir, n) for n in names]
        self.image_files = [p for p in candidates if os.path.exists(p)]
        self.missing = len(candidates) - len(self.image_files)
        # patch size 64 for 192, 96 for 288 (datasets.py:192-200)
        self.patch_out = 64 if image_size == 192 else 96
        self._seed = seed
        self._epoch_salt = _AtomicCounter()

    def __getitem__(self, i: int) -> np.ndarray:
        out_size = self.patch_out * 3
        rng = np.random.default_rng((self._seed, i, self._epoch_salt.next()))
        try:
            img = self._load(self.image_files[i])
            img = T.safe_resize(img)
            img = T.resize_shorter(img, 398)
            if self.split == "train":
                img = T.random_crop(img, 398, rng)
                if rng.random() < 0.5:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
                if rng.random() < 0.2:
                    img = img.transpose(Image.FLIP_TOP_BOTTOM)
                img = T.color_jitter(img, rng, brightness=0.3,
                                     contrast=0.3, saturation=0.3, hue=0.05)
            else:
                img = T.center_crop(img, 398)
            arr = T.normalize(T.to_array(img))
            return rand_erode(arr, rng, n=3, patch_out=self.patch_out,
                              region=self.patch_out + self.patch_out // 2,
                              gap=self.patch_out // 2)
        except Exception:
            # Black-image fallback (datasets.py:245-248) — but at the
            # configured size rather than the reference's hardcoded 288.
            return np.zeros((out_size, out_size, 3), dtype=np.float32)


class ImageFolderDataset(_Base):
    """Recursive image folder with the reference inference transform
    (center_crop_arr + normalize, inference.py:197-201)."""

    def __init__(self, root: str, image_size: int,
                 extensions: Sequence[str] = _IMG_EXTS):
        self.image_size = image_size
        files = []
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                if n.lower().endswith(tuple(extensions)):
                    files.append(os.path.join(dirpath, n))
        self.image_files = sorted(files)

    def __getitem__(self, i: int) -> np.ndarray:
        img = T.center_crop_arr(self._load(self.image_files[i]), self.image_size)
        return T.normalize(T.to_array(img))


class SyntheticPuzzles:
    """Deterministic structured images for tests/benchmarks (no disk IO).

    Smooth random Fourier textures with a choice of absolute-position cue
    regimes (``cues``), ordered by difficulty:

    - ``"coords"`` (default; ``position_cues=True``): explicit coordinate
      ramps painted into the R/G channels. Piece positions are locally
      inferable, so a model demonstrably LEARNS the image->position
      mapping within a short run instead of requiring reference-scale
      training (2.85M steps on ImageNet).
    - ``"natural"``: weak photometric cues of the kind real photographs
      carry — a random-strength center vignette plus top-lit vertical and
      faint horizontal luminance gradients, all channels equally. A single
      patch's mean luminance only weakly constrains its position (cue
      amplitude is well below texture variance), so the model must
      integrate cues with patch-boundary continuity. Middle difficulty.
    - ``"waves"``: the RELATIONAL regime (round 3). 2-3 low-frequency
      plane waves with per-image random orientation, frequency and phase.
      The field is strictly stationary (a sine with uniform random phase
      has a position-independent marginal), so a single piece's appearance
      carries ZERO absolute-position information — but with >=2
      non-parallel components the joint field is identifiable from the
      piece multiset, so the correct placement is recoverable only by
      integrating evidence ACROSS pieces (estimate the field jointly,
      place each piece by continuity). This isolates the relational
      capability the reference's ImageNet model exercises, at a
      difficulty a single-chip training budget can reach.
    - ``"none"`` (``position_cues=False``): pure texture. The wave field is
      statistically stationary, so absolute position is unidentifiable
      from any single patch; placement requires joint edge matching over
      all pieces. Hardest — measured flat-at-chance through 67.8k flagship
      steps (PERF.md round 2): 6 components up to 6 cycles/image leave no
      learnable low-frequency structure, unlike ``"waves"``.
    """

    def __init__(self, image_size: int = 192, n: int = 1024, seed: int = 0,
                 cache: bool = True, position_cues: bool = True,
                 cues: str | None = None, hard_frac: float = 0.0):
        self.image_size = image_size
        self.n = n
        self.seed = seed
        self.hard_frac = float(hard_frac)
        if cues is None:
            cues = "coords" if position_cues else "none"
        if cues not in ("coords", "natural", "waves", "none"):
            raise ValueError(f"unknown cue regime {cues!r}")
        self.cues = cues
        self.position_cues = cues == "coords"
        self.image_files = [f"synthetic_{i:06d}.png" for i in range(n)]
        # Texture synthesis is host-compute-bound; cache generated images so
        # epochs after the first are free (~0.4 MB/item at 192px fp32).
        self._cache: list = [None] * n if cache else []

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        if self._cache and self._cache[i] is not None:
            return self._cache[i]
        out = self._generate(i)
        if self._cache:
            self._cache[i] = out
        return out

    # ---------------------------------------------------- "waves" regime

    _WAVES_MAX_K = 3

    def _wave_params(self, i: int):
        """Per-image plane-wave parameters, padded to _WAVES_MAX_K rows
        (zero-amplitude padding). Drawn on host so the host and device
        generators share one RNG stream; values then differ only at fp32
        rounding between numpy and XLA sin.

        ``hard_frac``: probability of forcing the draw into the measured
        hard region of the 20x20 capability cliff — k=2, pairwise angle
        > 1.2 rad, max frequency > 0.85 (PERF.md "20x20 plateau": that
        8.8% of natural draw space carries a 30% failure rate vs 3.7%
        outside). Oversampling it is the curriculum lever the cliff
        analysis points at; draws stay deterministic per (seed, i)."""
        rng = np.random.default_rng(self.seed * 1000003 + i)
        if self.hard_frac and rng.random() < self.hard_frac:
            th = rng.uniform(0, np.pi)
            # second orientation 1.2..pi/2 rad away (mod pi), random side
            th2 = th + rng.choice([-1, 1]) * rng.uniform(1.2, np.pi / 2)
            th = np.mod([th, th2], np.pi)
            f = np.array([rng.uniform(0.85, 1.0), rng.uniform(0.25, 1.0)])
            rng.shuffle(f)
            pad = self._WAVES_MAX_K - 2
            return (np.pad(th, (0, pad)).astype(np.float32),
                    np.pad(f, (0, pad)).astype(np.float32),
                    np.pad(rng.uniform(0, 2 * np.pi, 2),
                           (0, pad)).astype(np.float32),
                    np.pad(rng.uniform(0.3, 1.0, (2, 3)),
                           ((0, pad), (0, 0))).astype(np.float32))
        # Mostly 2 components (3 at 30%): enough that the joint field is
        # identifiable, few enough that it is inferable. Frequencies are
        # ULTRA-low (0.25-1.0 cycles/image): the easiest draws are
        # randomly-oriented near-linear ramps, which gives gradient descent
        # a within-regime curriculum — the first waves parameterization
        # (0.4-1.8, k up to 3) measured flat-at-chance at every timestep
        # through 9k flagship steps, exactly like the round-2 stationary
        # texture negative.
        k = 2 + int(rng.random() < 0.3)
        # Orientations with pairwise separation >= 0.5 rad (mod pi):
        # near-parallel components would leave near-identical pieces along
        # the shared wavefront (an unresolvable permutation ambiguity).
        while True:
            th = rng.uniform(0, np.pi, k)
            d = np.abs(th[:, None] - th[None, :])
            d = np.minimum(d, np.pi - d)
            if np.all(d[np.triu_indices(k, 1)] >= 0.5):
                break
        pad = self._WAVES_MAX_K - k
        th = np.pad(th, (0, pad)).astype(np.float32)
        f = np.pad(rng.uniform(0.25, 1.0, k), (0, pad)).astype(np.float32)
        ph = np.pad(rng.uniform(0, 2 * np.pi, k), (0, pad)).astype(np.float32)
        amp = np.pad(rng.uniform(0.3, 1.0, (k, 3)),
                     ((0, pad), (0, 0))).astype(np.float32)
        return th, f, ph, amp

    @staticmethod
    def _waves_field(th, f, ph, amp, xx, yy, xp=np):
        """Shared host/device field math. th/f/ph: (K,), amp: (K, 3),
        xx/yy: (s, s) in [0, 1) -> (s, s, 3) in [-1, 1]."""
        u = (xp.cos(th)[:, None, None] * xx[None]
             + xp.sin(th)[:, None, None] * yy[None])          # (K, s, s)
        base = xp.sin(2 * np.float32(np.pi) * f[:, None, None] * u
                      + ph[:, None, None])                    # (K, s, s)
        img = xp.sum(base[..., None] * amp[:, None, None, :], axis=0)
        img = img / (xp.max(xp.abs(img)) + 1e-6)
        return xp.clip(img * 0.9, -1.0, 1.0)

    def device_batcher(self):
        """-> ``batch(indices) -> (len(indices), s, s, 3) bf16 device
        array``: wave fields synthesized ON DEVICE in one jitted program
        (host synthesis costs ~60 ms/item of sin() on a 1-core VM; the
        device path is ~ms per batch). Only the tiny per-image parameter
        draws stay on host, so items match the host ``__getitem__`` stream
        to fp32 rounding. ``_wave_params`` accepts ANY index, so callers
        may stream never-repeating fresh items (run_train
        data.device_stream) — an infinite-data regime no finite archive
        can offer, which removes memorization as a failure mode."""
        import jax
        import jax.numpy as jnp

        if self.cues != "waves":
            raise NotImplementedError("device generation is waves-only")
        s = self.image_size
        grid = np.mgrid[0:s, 0:s].astype(np.float32) / s
        yy, xx = jnp.asarray(grid[0]), jnp.asarray(grid[1])

        @jax.jit
        def gen(th, f, ph, amp):
            mk = lambda args: self._waves_field(  # noqa: E731
                *args, xx, yy, xp=jnp).astype(jnp.bfloat16)
            return jax.lax.map(mk, (th, f, ph, amp))

        def batch(indices):
            ps = [self._wave_params(i) for i in indices]
            th, f, ph, amp = (np.stack([p[j] for p in ps]) for j in range(4))
            return gen(th, f, ph, amp)

        return batch

    def device_generate_all(self, batch: int = 512):
        """Whole-dataset device synthesis (chunked ``device_batcher``)."""
        import jax.numpy as jnp

        gen = self.device_batcher()
        chunks = [gen(range(i, min(i + batch, self.n)))
                  for i in range(0, self.n, batch)]
        return jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]

    def _generate(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 1000003 + i)
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        if self.cues == "waves":
            th, f, ph, amp = self._wave_params(i)
            return self._waves_field(th, f, ph, amp, xx, yy).astype(np.float32)
        # Draw per-wave (preserves the historical RNG stream — but note the
        # VALUES differ from pre-round-2 builds at ~1e-7: the old per-wave
        # loop upcast to float64 inside sin and cost ~0.18 s/item, which
        # dominated device-cache staging; this computes all 6 waves
        # vectorized in float32).
        f = np.empty((6, 2), np.float32)
        ph = np.empty((6, 1, 1, 3), np.float32)
        amp = np.empty((6, 1, 1, 3), np.float32)
        for w in range(6):
            f[w] = rng.uniform(0.5, 6.0, 2)
            ph[w, 0, 0] = rng.uniform(0, 2 * np.pi, 3)
            amp[w, 0, 0] = rng.uniform(0.2, 1.0, 3)
        base = f[:, 0, None, None] * xx + f[:, 1, None, None] * yy  # (6,s,s)
        img = np.sum(np.sin(2 * np.float32(np.pi) * base[..., None] + ph)
                     * amp, axis=0)
        img /= np.abs(img).max() + 1e-6
        if self.cues == "coords":
            img *= 0.6
            img[..., 0] += (xx * 2 - 1) * 0.4
            img[..., 1] += (yy * 2 - 1) * 0.4
        elif self.cues == "natural":
            # Photometric cues, drawn AFTER the texture params so the
            # underlying wave stream matches the other regimes item-for-
            # item. Luminance-only (all channels), amplitudes well below
            # the texture's ±1 range.
            vig = np.float32(rng.uniform(0.15, 0.35))   # center vignette
            gv = np.float32(rng.uniform(0.10, 0.30))    # top-lit vertical
            gh = np.float32(rng.uniform(0.05, 0.15))    # faint horizontal
            r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
            shade = -vig * 2.0 * r2 - gv * (yy - 0.5) + gh * (xx - 0.5)
            img = img * 0.85 + shade[..., None]
        return np.clip(img, -1.0, 1.0).astype(np.float32)


def rand_erode(arr: np.ndarray, rng: np.random.Generator, *, n: int = 3,
               patch_out: int = 96, region: int = 100, gap: int = 48) -> np.ndarray:
    """Gapped-collage puzzle synthesis (datasets.py:73-88,205-223).

    From an (H, W, C) array, take a random ``patch_out`` crop from each of
    the n x n ``region``-sized cells separated by ``gap`` px, and tile them
    into an (n*patch_out, n*patch_out, C) collage.
    """
    c = arr.shape[-1]
    out = np.zeros((n * patch_out, n * patch_out, c), dtype=arr.dtype)
    stride = region + gap
    for i in range(n):
        for j in range(n):
            top, left = i * stride, j * stride
            cell = arr[top:top + region, left:left + region]
            dy = int(rng.integers(0, cell.shape[0] - patch_out + 1))
            dx = int(rng.integers(0, cell.shape[1] - patch_out + 1))
            out[i * patch_out:(i + 1) * patch_out,
                j * patch_out:(j + 1) * patch_out] = (
                cell[dy:dy + patch_out, dx:dx + patch_out])
    return out
