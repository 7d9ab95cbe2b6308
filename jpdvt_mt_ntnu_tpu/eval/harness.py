"""Batched, resumable, multi-host evaluation harness.

Replaces the whole reference eval-script family with one engine
(SURVEY.md §2.1): inference.py (single-GPU 3x3), inference_4x4.py,
inference_ddp*.py (rank-strided sharding), inferencetexmet.py (batched
DataParallel), inference_texrec*.py (directory variants). Differences from
the reference are all upgrades:

- puzzles are solved in BATCHES inside one jitted program (the reference is
  batch-1 except inferencetexmet.py);
- hosts shard files by ``paths[process_index::process_count]``
  (inference_ddp.py:325) and write per-host journals (no racy appends);
- per-item failures (decode errors) are skipped and logged, and completed
  items resume from the journal exactly like the reference
  (inference.py:236-245,367-370);
- host work overlaps device work (round 3): batch N+1 decodes on a
  prefetch thread while the device solves batch N (the C++ decoder
  releases the GIL for exactly this), and journaling/PNG-writing happens
  on an ordered writer thread — the eval loop is device-bound instead of
  host-bound (was 13x slower than the solve it wrapped);
- the solve itself is software-pipelined (round 4): batch N+1 is
  DISPATCHED before batch N's results are materialized (JAX async
  dispatch; solver.evaluate_async), so the device queue never drains on
  D2H/journaling, and the hungarian path pulls its distance tensor in the
  same single bundled transfer.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from ..data import transforms as T
from ..utils.logging import setup_logging
from .journal import ProgressJournal
from .solver import PuzzleSolver


@dataclasses.dataclass
class EvalReport:
    puzzle_accuracy: float
    patch_accuracy: float
    count: int
    total_time_s: float
    puzzles_per_sec: float


class EvalHarness:
    def __init__(self, solver: PuzzleSolver, params, *, logs_dir: str,
                 batch_size: int = 64, seed: int = 0,
                 results_dir: Optional[str] = None,
                 journal_name: str = "inference_progress.csv",
                 process_index: int = 0, process_count: int = 1,
                 use_native_decode: bool | None = None):
        self.solver = solver
        self.params = params
        self.batch_size = batch_size
        self.seed = seed
        self.results_dir = results_dir
        self.logs_dir = logs_dir
        self.journal = ProgressJournal(logs_dir, journal_name,
                                       host_index=process_index)
        self.process_index = process_index
        self.process_count = process_count
        if use_native_decode is None:
            from ..ops import native

            use_native_decode = native.available()
        self.use_native_decode = use_native_decode
        self.logger, self.err_logger = setup_logging(logs_dir)

    # ----------------------------------------------------------------- util

    def _load_image(self, path: str) -> np.ndarray:
        size = self.solver.cfg.input_size
        if self.use_native_decode:
            from ..ops import native

            with open(path, "rb") as f:
                return native.decode_center_crop(f.read(), size)
        from PIL import Image

        img = T.center_crop_arr(Image.open(path).convert("RGB"), size)
        return T.normalize(T.to_array(img))

    def _save_images(self, name: str, original, scrambled, reconstructed,
                     puzzle_correct: int, patch_acc: float) -> None:
        """Metric-tagged output PNGs, reference naming (inference.py:332-344),
        plus a combined original|scrambled|reconstructed panel with white
        spacers (the inference_4x4.py:337-361 / inference_ddp.py:92-136
        format)."""
        from PIL import Image

        out_dir = os.path.join(self.results_dir, f"Grid{self.solver.grid}")
        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(name)[0]

        def to_u8(arr):
            return (T.denormalize(np.asarray(arr)) * 255).astype(np.uint8)

        def save(arr, suffix):
            Image.fromarray(to_u8(arr)).save(
                os.path.join(out_dir, f"{stem}_{suffix}.png"))

        save(original, "original")
        save(scrambled, "random")
        save(reconstructed,
             f"reconstructed_pAcc={puzzle_correct}_patchAcc={patch_acc:.2f}")
        panels = [to_u8(a) for a in (original, scrambled, reconstructed)]
        spacer = np.full((panels[0].shape[0], 8, 3), 255, np.uint8)
        combined = np.concatenate(
            [panels[0], spacer, panels[1], spacer, panels[2]], axis=1)
        Image.fromarray(combined).save(
            os.path.join(out_dir, f"{stem}_combined.png"))

    # ------------------------------------------------------------------ run

    def run_paths(self, image_paths: Sequence[str],
                  loader: Optional[Callable[[str], np.ndarray]] = None,
                  limit: int = 0) -> EvalReport:
        """Evaluate a list of image files (resumable)."""
        loader = loader or self._load_image
        p = self.solver.grid ** 2
        state = self.journal.load()
        my_paths = list(image_paths)[self.process_index::self.process_count]
        # Journal key: basename when unique (reference schema,
        # inference.py:172), full path otherwise (class-per-dir trees reuse
        # basenames; keying on them would mis-attribute results).
        basenames = [os.path.basename(q) for q in image_paths]
        unique_base = len(set(basenames)) == len(basenames)
        key_of = os.path.basename if unique_base else (lambda q: q)
        todo = [q for q in my_paths if key_of(q) not in state.processed]
        if limit:
            todo = todo[:max(0, limit - state.count)]
        self.logger.info(
            f"[host {self.process_index}/{self.process_count}] "
            f"{len(my_paths)} files assigned, {state.count} already done, "
            f"{len(todo)} to go")

        rng = np.random.default_rng(self.seed + self.process_index)
        start = time.time()
        done_this_run = 0

        def load_chunk(chunk):
            images, names = [], []
            for q in chunk:
                try:
                    images.append(loader(q))
                    names.append(key_of(q))
                except Exception as e:  # decode failure: skip + log
                    self.err_logger.error(f"Failed on image {key_of(q)}: {e}")
                    self.logger.error(f"Skipping {key_of(q)} due to error.")
            # Stack on the prefetch thread too — keeps the dispatch loop free.
            return (np.stack(images) if images else None), names

        def write_results(names, batch, res, per_item):
            # Runs on the single writer thread: journal appends stay in
            # submission order (resume correctness), PNG encodes overlap
            # the next device solve.
            if self.results_dir:
                scrambled = self.solver._scramble(batch, res.indices)
                recon = self.solver.reconstruct(scrambled, res.pred)
                for i, n in enumerate(names):
                    self._save_images(n, batch[i], np.asarray(scrambled[i]),
                                      np.asarray(recon[i]),
                                      int(res.puzzle_correct[i]),
                                      float(res.patch_matches[i]) / p)
            for i, n in enumerate(names):
                self.journal.append(n, int(res.puzzle_correct[i]),
                                    int(res.patch_matches[i]), per_item)

        from concurrent.futures import ThreadPoolExecutor

        chunks = [todo[i:i + self.batch_size]
                  for i in range(0, len(todo), self.batch_size)]

        last_done: list = [None]  # completion time of the previous batch

        def finalize(names, batch, thunk, t0):
            # Blocks on batch N's D2H while the device runs batch N+1
            # (already dispatched) — the solve queue never drains.
            nonlocal done_this_run
            try:
                res = thunk()
            except Exception as e:
                self.err_logger.error(
                    f"Batch solve failed ({names[0]}...): {e}")
                return
            # Under pipelining, (now - t0) spans TWO batches (batch N's
            # window overlaps batch N+1's prefetch+dispatch) and would
            # double-count.  The honest steady-state rate is the
            # completion-to-completion interval.
            now = time.time()
            elapsed = now - (last_done[0] if last_done[0] is not None else t0)
            last_done[0] = now
            per_item = elapsed / len(names)
            writes.append(writer.submit(write_results, names, batch, res,
                                        per_item))
            for i, n in enumerate(names):
                state.processed.add(n)
                state.puzzle_correct += int(res.puzzle_correct[i])
                state.patch_matches += int(res.patch_matches[i])
                state.count += 1
                done_this_run += 1
            pa, ta = state.accuracy(p)
            self.logger.info(
                f"{state.count} done | batch {len(names)} in {elapsed:.2f}s "
                f"({len(names) / elapsed:.2f} puzzles/s) | running "
                f"puzzleAcc={pa:.4f} patchAcc={ta:.4f}")

        with ThreadPoolExecutor(1, "eval-prefetch") as prefetch, \
                ThreadPoolExecutor(1, "eval-writer") as writer:
            pending = prefetch.submit(load_chunk, chunks[0]) if chunks else None
            writes: list = []
            in_flight = None  # (names, batch, result_thunk, t0)
            for ci in range(len(chunks)):
                batch, names = pending.result()
                pending = (prefetch.submit(load_chunk, chunks[ci + 1])
                           if ci + 1 < len(chunks) else None)
                if batch is None:
                    continue
                t0 = time.time()
                key = jax.random.key(int(rng.integers(0, 2**31)))
                try:
                    # Async dispatch: returns as soon as the program is
                    # queued; materialization happens in finalize AFTER the
                    # next batch is dispatched (software pipelining).
                    thunk = self.solver.evaluate_async(self.params, batch,
                                                       key)
                except Exception as e:
                    self.err_logger.error(
                        f"Batch dispatch failed ({names[0]}...): {e}")
                    continue
                if in_flight is not None:
                    finalize(*in_flight)
                in_flight = (names, batch, thunk, t0)
            if in_flight is not None:
                finalize(*in_flight)
            for w in writes:
                w.result()  # surface writer exceptions; all rows persisted

        total = time.time() - start
        pa, ta = state.accuracy(p)
        # Throughput counts only items processed THIS run; state.count also
        # includes rows resumed from earlier journals.
        report = EvalReport(pa, ta, state.count, total,
                            (done_this_run / total) if total > 0 else 0.0)
        self.logger.info("============================================")
        self.logger.info(f"Done. Processed {state.count} images "
                         f"(including resumed ones).")
        self.logger.info(f"Final Puzzle Accuracy: {pa:.4f}")
        self.logger.info(f"Final Patch Accuracy: {ta:.4f}")
        self.logger.info(f"Total inference time: {total:.2f}s")
        self.journal.close()
        return report

    def run_dataset(self, dataset, limit: int = 0) -> EvalReport:
        """Evaluate an indexable dataset (items are HWC [-1,1] arrays)."""
        names = getattr(dataset, "image_files", None) or [
            f"item_{i:06d}" for i in range(len(dataset))]
        index = {n: i for i, n in enumerate(names)}  # full names: no
        # basename collapsing (class dirs reuse basenames)

        if getattr(dataset, "cues", None) == "waves":
            # Synthesize the whole set on device up front (seconds) instead
            # of ~60 ms/item of host sin() inside the eval loop.
            arr = np.asarray(dataset.device_generate_all(),
                             dtype=np.float32)

            def loader(path):
                return arr[index[path]]
        else:
            def loader(path):
                return dataset[index[path]]

        return self.run_paths(list(names), loader=loader, limit=limit)


def find_images(data_dir: str,
                extensions=(".jpg", ".jpeg", ".png"),
                exclude_substr: Optional[str] = None) -> list[str]:
    """Recursive image listing; optional exclusion (texrec skips '*mask*'
    files, reference inference_texrec.py:239-247)."""
    out = []
    for dirpath, _, files in os.walk(data_dir):
        for f in sorted(files):
            if f.lower().endswith(tuple(e.lower() for e in extensions)):
                if exclude_substr and exclude_substr in f.lower():
                    continue
                out.append(os.path.join(dirpath, f))
    return sorted(out)
