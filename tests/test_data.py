"""Host data pipeline: transforms, datasets, loader."""

import os

import numpy as np
import pytest
from PIL import Image

from jpdvt_mt_ntnu_tpu.data import (
    ImageFolderDataset,
    Loader,
    METDataset,
    SyntheticPuzzles,
    TEXMETDataset,
)
from jpdvt_mt_ntnu_tpu.data import transforms as T
from jpdvt_mt_ntnu_tpu.data.datasets import rand_erode


def _write_img(path, w=450, h=420, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def test_center_crop_arr_shapes():
    img = Image.new("RGB", (1000, 700), (10, 20, 30))
    out = T.center_crop_arr(img, 192)
    assert out.size == (192, 192)
    # small image upscales
    out = T.center_crop_arr(Image.new("RGB", (100, 150)), 192)
    assert out.size == (192, 192)


def test_normalize_roundtrip():
    x = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(T.denormalize(T.normalize(x)), x, atol=1e-6)


def test_rand_erode_geometry():
    rng = np.random.default_rng(0)
    arr = np.arange(398 * 398 * 3, dtype=np.float32).reshape(398, 398, 3)
    out = rand_erode(arr, rng, n=3, patch_out=96, region=100, gap=48)
    assert out.shape == (288, 288, 3)
    # each output cell must be a contiguous crop from its source region
    cell = out[:96, :96]
    assert cell.min() >= arr[0:100, 0:100].min()
    assert cell.max() <= arr[0:100, 0:100].max()


@pytest.fixture
def met_dir(tmp_path):
    root = tmp_path / "met"
    for sub in ("a", "b", "c"):
        for i in range(4):
            _write_img(str(root / sub / f"{sub}{i}.jpg"), seed=i)
    return str(root)


def test_met_dataset(met_dir):
    # 12 images: test split sized min(...) -> sklearn requires test_size < n;
    # use small split sizes for the fixture
    from jpdvt_mt_ntnu_tpu.data.datasets import _split_indices

    train, val, test = _split_indices(12, test_size=3, val_size=2)
    assert len(test) == 3 and len(val) == 2 and len(train) == 7
    assert set(train + val + test) == set(range(12))


def test_met_getitem(met_dir, monkeypatch):
    import jpdvt_mt_ntnu_tpu.data.datasets as D

    monkeypatch.setattr(
        D, "_split_indices",
        lambda n, seed=42, **kw: (list(range(n - 4)), [n - 4, n - 3],
                                  [n - 2, n - 1]))
    for split in ("train", "val", "test"):
        ds = METDataset(met_dir, split)
        x = ds[0]
        assert x.shape == (288, 288, 3)
        assert -1.01 <= x.min() and x.max() <= 1.01


@pytest.fixture
def texmet_dir(tmp_path):
    root = tmp_path / "texmet"
    os.makedirs(root / "images", exist_ok=True)
    names = []
    for i in range(5):
        name = f"tex_{i}.jpg"
        _write_img(str(root / "images" / name), seed=i)
        names.append(f"train/images/{name}")
    names.append("train/images/missing.jpg")  # exercises the filter
    (root / "test_files.txt").write_text("\n".join(names))
    return str(root)


def test_texmet_dataset(texmet_dir):
    ds = TEXMETDataset(texmet_dir, "test", image_size=192)
    assert len(ds) == 5 and ds.missing == 1
    x = ds[0]
    assert x.shape == (192, 192, 3)  # 64*3 collage
    ds288 = TEXMETDataset(texmet_dir, "test", image_size=288)
    assert ds288[0].shape == (288, 288, 3)


def test_texmet_requires_split_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        TEXMETDataset(str(tmp_path), "test")


def test_texmet_black_fallback(texmet_dir):
    ds = TEXMETDataset(texmet_dir, "test", image_size=192)
    # corrupt a file on disk
    with open(ds.image_files[2], "wb") as f:
        f.write(b"garbage")
    x = ds[2]
    assert x.shape == (192, 192, 3)
    assert np.abs(x).max() == 0.0


def test_image_folder(tmp_path):
    for i in range(3):
        _write_img(str(tmp_path / "sub" / f"i{i}.JPEG"), seed=i)
    ds = ImageFolderDataset(str(tmp_path), 96, extensions=(".jpeg",))
    assert len(ds) == 3
    assert ds[0].shape == (96, 96, 3)


def test_loader_sharding_and_epochs():
    ds = SyntheticPuzzles(48, n=32)
    l0 = Loader(ds, 4, shuffle=True, seed=1, num_workers=2,
                process_index=0, process_count=2)
    l1 = Loader(ds, 4, shuffle=True, seed=1, num_workers=2,
                process_index=1, process_count=2)
    assert len(l0) == len(l1) == 4
    b0 = list(l0)
    b1 = list(l1)
    assert all(b.shape == (4, 48, 48, 3) for b in b0 + b1)
    # different shards produce different data
    assert not np.allclose(b0[0], b1[0])
    # epoch reshuffle changes order
    l0.set_epoch(1)
    b0e1 = list(l0)
    assert not np.allclose(b0[0], b0e1[0])


def test_synthetic_deterministic_and_cached():
    ds = SyntheticPuzzles(48, n=4)
    a, b = ds[1], SyntheticPuzzles(48, n=4)[1]
    np.testing.assert_array_equal(a, b)
    assert ds[1] is ds._cache[1]  # cache hit returns same object


def test_synthetic_cue_regimes():
    import pytest

    coords = SyntheticPuzzles(48, n=6, cues="coords")
    natural = SyntheticPuzzles(48, n=6, cues="natural")
    none = SyntheticPuzzles(48, n=6, cues="none")
    # Boolean alias maps onto the regimes
    np.testing.assert_array_equal(
        SyntheticPuzzles(48, n=6, position_cues=False)[2], none[2])
    np.testing.assert_array_equal(
        SyntheticPuzzles(48, n=6, position_cues=True)[2], coords[2])
    with pytest.raises(ValueError):
        SyntheticPuzzles(48, n=6, cues="wat")

    # Natural cues: same underlying texture stream, plus photometric
    # shading — top rows brighter than bottom (top-lit), center brighter
    # than corners (vignette), averaged over items.
    tops, bottoms, centers, corners = [], [], [], []
    for i in range(6):
        img = natural[i]
        assert img.shape == (48, 48, 3)
        tops.append(img[:16].mean())
        bottoms.append(img[-16:].mean())
        centers.append(img[16:32, 16:32].mean())
        corners.append((img[:8, :8].mean() + img[:8, -8:].mean()
                        + img[-8:, :8].mean() + img[-8:, -8:].mean()) / 4)
    assert np.mean(tops) > np.mean(bottoms) + 0.05
    assert np.mean(centers) > np.mean(corners) + 0.05
    # and the cue is luminance-only: channel means move together, unlike
    # the coords regime which codes x/y into R/G specifically.
    ch = natural[0].mean(axis=(0, 1))
    assert ch.std() < 0.15


def test_waves_regime_host_device_parity_and_stationarity():
    """The relational 'waves' regime: host/device generators agree, images
    are valid and distinct, and — the defining property — no grid position
    is systematically brighter/darker across images (a sine field with
    uniform random phase is stationary, so single-piece appearance carries
    no absolute-position signal)."""
    ds = SyntheticPuzzles(48, n=48, cues="waves")
    a = ds[0]
    assert a.shape == (48, 48, 3) and a.dtype == np.float32
    assert np.abs(a).max() <= 1.0
    assert not np.allclose(ds[0], ds[1])
    # determinism
    np.testing.assert_array_equal(a, SyntheticPuzzles(48, n=2, cues="waves")[0])

    # Host vs device generation (fp32 vs XLA sin: tiny rounding, plus the
    # bf16 storage cast of the device path).
    dev = np.asarray(ds.device_generate_all(batch=16), np.float32)
    for i in (0, 7, 47):
        np.testing.assert_allclose(dev[i], ds[i], atol=2e-2)

    # Stationarity: per-position piece means, averaged over images, are all
    # ~0 and indistinguishable across the 9 grid slots.
    p = 16
    means = np.zeros((3, 3))
    for i in range(48):
        img = ds[i]
        for r in range(3):
            for c in range(3):
                means[r, c] += img[r*p:(r+1)*p, c*p:(c+1)*p].mean() / 48
    assert np.abs(means).max() < 0.08, means


def test_waves_components_not_near_parallel():
    ds = SyntheticPuzzles(48, n=64, cues="waves")
    for i in range(64):
        th, f, ph, amp = ds._wave_params(i)
        live = amp.sum(-1) > 0
        t = th[live]
        assert 2 <= live.sum() <= 3
        assert (f[live] >= 0.25).all() and (f[live] <= 1.0).all()
        d = np.abs(t[:, None] - t[None, :])
        d = np.minimum(d, np.pi - d)
        iu = np.triu_indices(len(t), 1)
        assert (d[iu] >= 0.5).all()


def test_waves_hard_frac_targets_measured_region():
    """hard_frac=1 forces every draw into the measured 20x20 cliff region
    (k=2, pairwise angle > 1.2 rad, max frequency > 0.85 — PERF.md "20x20
    plateau"); hard_frac=0 leaves the stream bit-identical to the default;
    draws stay deterministic per (seed, i) and valid for the device path."""
    hard = SyntheticPuzzles(48, n=32, cues="waves", hard_frac=1.0)
    for i in range(32):
        th, f, ph, amp = hard._wave_params(i)
        live = amp.sum(-1) > 0
        assert live.sum() == 2
        t = th[live]
        d = np.abs(t[0] - t[1])
        d = min(d, np.pi - d)
        assert d > 1.2
        assert f[live].max() > 0.85
        assert (f[live] >= 0.25).all() and (f[live] <= 1.0).all()
    # determinism per (seed, i)
    a = hard._wave_params(5)
    b = SyntheticPuzzles(48, n=32, cues="waves", hard_frac=1.0)._wave_params(5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # hard_frac=0 is bit-identical to the default stream
    base = SyntheticPuzzles(48, n=8, cues="waves")
    off = SyntheticPuzzles(48, n=8, cues="waves", hard_frac=0.0)
    for i in range(8):
        np.testing.assert_array_equal(base[i], off[i])
    # mixing: ~half the draws land in the hard region
    mix = SyntheticPuzzles(48, n=256, cues="waves", hard_frac=0.5)
    n_hard = 0
    for i in range(256):
        th, f, ph, amp = mix._wave_params(i)
        live = amp.sum(-1) > 0
        t = th[live]
        d = np.abs(t[:, None] - t[None, :])
        d = np.minimum(d, np.pi - d)
        iu = np.triu_indices(len(t), 1)
        if live.sum() == 2 and (d[iu] > 1.2).all() and f[live].max() > 0.85:
            n_hard += 1
    assert 90 <= n_hard <= 190  # 0.5 +- noise (plus ~4% natural hard draws)
    # hard draws render through the shared host field path
    img = hard[0]
    assert img.shape == (48, 48, 3) and np.abs(img).max() <= 1.0
