"""Eval harness: journaling, resume, multi-host sharding, dataset eval."""

import os

import jax
import numpy as np

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.harness import EvalHarness, find_images
from jpdvt_mt_ntnu_tpu.eval.journal import ProgressJournal
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.models import create_model

from test_solver import _OracleModel, _slot_images


class _SlotDataset:
    """Dataset of slot-id images the oracle model solves perfectly."""

    def __init__(self, n=10, size=48):
        self.image_files = [f"img_{i:03d}.png" for i in range(n)]
        self._x = np.asarray(_slot_images(1, size, 3))[0]

    def __len__(self):
        return len(self.image_files)

    def __getitem__(self, i):
        return self._x


def _solver():
    _, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=32,
                          num_heads=2, attn_impl="xla")
    model = _OracleModel(cfg, 3)
    return PuzzleSolver(model, cfg, create_diffusion("5"), grid_size=3)


def test_harness_perfect_and_resume(tmp_path):
    solver = _solver()
    logs = str(tmp_path / "logs")
    ds = _SlotDataset(10)
    h = EvalHarness(solver, None, logs_dir=logs, batch_size=4)
    rep = h.run_dataset(ds)
    assert rep.count == 10
    assert rep.puzzle_accuracy == 1.0 and rep.patch_accuracy == 1.0

    # Resume: everything already processed -> count preserved, nothing re-run.
    h2 = EvalHarness(solver, None, logs_dir=logs, batch_size=4)
    rep2 = h2.run_dataset(ds)
    assert rep2.count == 10 and rep2.puzzle_accuracy == 1.0


def test_harness_multihost_shards_disjoint(tmp_path):
    solver = _solver()
    logs = str(tmp_path / "logs")
    ds = _SlotDataset(9)
    for rank in range(3):
        h = EvalHarness(solver, None, logs_dir=logs, batch_size=4,
                        process_index=rank, process_count=3)
        h.run_dataset(ds)
    merged = ProgressJournal(logs).load()
    assert merged.count == 9
    assert merged.puzzle_correct == 9
    # three separate journal files, no interleaved writes
    files = [f for f in os.listdir(logs) if f.endswith(".csv")]
    assert len(files) == 3


def test_harness_skips_bad_items(tmp_path):
    solver = _solver()

    class Flaky(_SlotDataset):
        def __getitem__(self, i):
            if i == 3:
                raise IOError("corrupt image")
            return super().__getitem__(i)

    h = EvalHarness(solver, None, logs_dir=str(tmp_path / "l"), batch_size=4)
    rep = h.run_dataset(Flaky(8))
    assert rep.count == 7  # one skipped
    err_log = open(os.path.join(str(tmp_path / "l"),
                                "inference_errors.txt")).read()
    assert "img_003" in err_log


def test_find_images_excludes_masks(tmp_path):
    for name in ["a.jpg", "b_mask.jpg", "c.png", "d.txt"]:
        (tmp_path / name).write_bytes(b"x")
    found = find_images(str(tmp_path), exclude_substr="mask")
    names = [os.path.basename(f) for f in found]
    assert names == ["a.jpg", "c.png"]


def test_save_images(tmp_path):
    solver = _solver()
    h = EvalHarness(solver, None, logs_dir=str(tmp_path / "logs"),
                    batch_size=4, results_dir=str(tmp_path / "out"))
    h.run_dataset(_SlotDataset(2))
    out = os.listdir(tmp_path / "out" / "Grid3")
    assert any("original" in f for f in out)
    assert any("pAcc=1" in f for f in out)


def test_harness_logged_intervals_sum_to_total(tmp_path):
    # Under software pipelining each batch's naive (t_done - t_dispatch)
    # span covers TWO batches (the next batch's prefetch+dispatch overlaps
    # it); the harness must log completion-to-completion intervals, which
    # partition the wall clock: their sum can never exceed the total.
    solver = _solver()
    logs = str(tmp_path / "logs")
    h = EvalHarness(solver, None, logs_dir=logs, batch_size=4)
    rep = h.run_dataset(_SlotDataset(16))
    assert rep.count == 16
    j = ProgressJournal(logs).load()
    # per_item journal times are interval/len(batch): 4 batches of 4
    # (2dp CSV rounding -> up to 16 * 0.005 slack).
    assert j.total_time <= rep.total_time_s + 0.1
