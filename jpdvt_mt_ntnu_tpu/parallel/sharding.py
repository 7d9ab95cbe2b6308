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

Fully-sharded data parallelism (optional 'fsdp' axis): the batch shards
over ('data','fsdp') combined, and every weight matrix ADDITIONALLY shards
its largest still-free divisible dim over 'fsdp' — so params, EMA and the
adam moments occupy 1/fsdp of each chip (ZeRO-3). GSPMD turns the
annotations into per-layer weight all-gathers in the forward/backward and
gradient reduce-scatters, the same program Megatron-LM/FairScale build by
hand (reference has neither: plain DDP replicates everything,
train_JPDVT.py:231). Leaves whose dims don't divide stay replicated —
correctness never depends on divisibility.
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

# Expert-choice MoE (models/moe.py): stacked expert params carry a leading
# E dim that shards over 'ep'; per expert, the fc1-out / fc2-in feature
# dims take the same Megatron 'model' split as the dense MLP.
_EP_RULES: dict[str, P] = {
    "wi": P("ep", None, "model"),
    "bi": P("ep", "model"),
    "wo": P("ep", "model", None),
    "bo": P("ep", None),
}


def _spec_for(path: tuple[str, ...], ndim: int, ep: bool = False) -> P:
    names = tuple(str(getattr(k, "key", k)) for k in path)
    if "mlp" in names and names[-1] in _EP_RULES:
        spec = _EP_RULES[names[-1]]
        if not ep:  # no 'ep' axis in the mesh: replicate the expert dim
            spec = P(*((None,) + tuple(spec)[1:]))
        return spec
    for keys, kspec, bspec in _TP_RULES:
        if all(any(k == n for n in names) for k in keys):
            if names[-1] == "kernel" and ndim == 2:
                return kspec
            if names[-1] == "bias" and ndim == 1:
                return bspec
    return P()


def _with_fsdp(spec: P, shape: tuple[int, ...], fsdp: int) -> P:
    """Augment a TP spec with 'fsdp' on the largest free divisible dim.

    Only >=2-D leaves shard (the memory is in the matrices; sharding tiny
    1-D scales/biases would buy nothing and cost a collective each)."""
    if fsdp <= 1 or len(shape) < 2:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    free = [i for i, (e, d) in enumerate(zip(entries, shape))
            if e is None and d % fsdp == 0]
    if not free:
        return spec
    entries[max(free, key=lambda i: shape[i])] = "fsdp"
    return P(*entries)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings for a DiT param tree (TP on 'model' axis,
    expert sharding on 'ep', ZeRO param sharding on the 'fsdp' axis when
    the mesh carries those axes)."""
    fsdp = mesh.shape["fsdp"] if "fsdp" in mesh.axis_names else 1
    ep = "ep" in mesh.axis_names

    def spec(path, leaf):
        return _with_fsdp(_spec_for(path, leaf.ndim, ep=ep), leaf.shape, fsdp)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec(path, leaf)), params)


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
    """Shard the leading (batch) dim over 'data' (and 'fsdp' when present),
    replicate the rest."""
    from .mesh import batch_axes

    axes = batch_axes(mesh)
    lead = axes[0] if len(axes) == 1 else axes
    return NamedSharding(mesh, P(*((lead,) + (None,) * (ndim - 1))))


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
