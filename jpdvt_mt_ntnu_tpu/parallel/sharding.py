"""Sharding rules: how params and batches map onto the ('data','model') mesh.

Data parallelism = batch sharded on 'data', params replicated; gradients are
reduced by XLA automatically when the jitted train step consumes sharded
batches and produces replicated params (the DDP allreduce of
reference train_JPDVT.py:231,370 disappears into the compiler).

Tensor parallelism (optional 'model' axis) follows the Megatron pattern on
the DiT blocks: qkv/fc1 shard their OUTPUT feature dim, proj/fc2 shard their
INPUT feature dim, so each block needs exactly one reduction per sublayer,
inserted by GSPMD. Note: the Pallas attention kernel is not GSPMD-
partitionable — use ``attn_impl='xla'`` whenever model-axis > 1.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Param-path substring -> PartitionSpec for the 'model' axis (kernel, bias).
_TP_RULES: list[tuple[tuple[str, ...], P, P]] = [
    (("attn", "qkv"), P(None, "model"), P("model")),
    (("attn", "proj"), P("model", None), P(None)),
    (("mlp", "fc1"), P(None, "model"), P("model")),
    (("mlp", "fc2"), P("model", None), P(None)),
]


def _spec_for(path: tuple[str, ...], ndim: int) -> P:
    names = tuple(str(getattr(k, "key", k)) for k in path)
    for keys, kspec, bspec in _TP_RULES:
        if all(any(k == n for n in names) for k in keys):
            if names[-1] == "kernel" and ndim == 2:
                return kspec
            if names[-1] == "bias" and ndim == 1:
                return bspec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings for a DiT param tree (TP on 'model' axis)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf.ndim)),
        params,
    )


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for a whole TrainState (params, EMA, optimizer state).

    ``param_shardings`` keys on param-path *names*, and every param-shaped
    subtree of the state preserves those names: EMA mirrors params, and the
    optimizer moments (adam mu/nu) are dicts with identical paths. Scalar
    leaves (step counter, adam count) match no rule and replicate. So the
    TP specs apply uniformly to the full state — this is what the
    production trainer device_puts its state with (run_train.main), and
    what checkpoint restore re-places onto the mesh.
    """
    return param_shardings(state, mesh)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree onto the mesh, batch-dim sharded.

    Single-process: a plain sharded device_put. Multi-process: each host
    passes its PROCESS-LOCAL slice of the global batch (the Loader already
    shards indices by process) and the slices are assembled into one global
    array — the TPU analogue of DistributedSampler feeding DDP ranks
    (reference train_JPDVT.py:296-311)."""

    def put(x):
        sharding = batch_sharding(mesh, x.ndim)
        if jax.process_count() > 1:
            import numpy as np

            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
