"""Orbax checkpointing: {params, ema, opt_state, step} + run metadata.

TPU-native replacement for the reference's pickled torch dicts
(reference: image_model/train_JPDVT.py:408-418 save;
:239-274 full-state resume). Async-capable, multi-host safe, and
restores by step or latest. Lenient loading (the reference's key-filtered
``strict=False``, inference.py:207-211) maps to Orbax restore with an
abstract target tree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, metadata: dict | None = None,
             force: bool = False) -> None:
        step = int(state.step)
        if step in self._mgr.all_steps():
            # already checkpointed (e.g. the final save right after a
            # periodic save at the same step) — orbax raises otherwise
            return
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
        )
        self._mgr.save(step, args=args, force=force)
        if metadata is not None:
            with open(os.path.join(self.directory, "metadata.json"), "w") as f:
                json.dump(metadata, f, indent=2, default=str)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract)))
        return restored["state"]

    def metadata(self) -> dict:
        path = os.path.join(self.directory, "metadata.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def close(self) -> None:
        self._mgr.close()
