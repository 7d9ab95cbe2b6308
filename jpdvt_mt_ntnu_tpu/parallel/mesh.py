"""Device-mesh construction — the framework's entire "communication backend".

The reference's distributed layer is NCCL process groups + DDP wrappers
(reference: image_model/train_JPDVT.py:111,231; inference_ddp.py:77-87). On
TPU none of that exists as user code: we build a `jax.sharding.Mesh` over
ICI (and DCN between slices), annotate shardings, and XLA inserts the
collectives. This module is the explicit, testable home for that decision
(SURVEY.md §5.8).

Axes:
- ``data``   batch data parallelism (the only parallelism the reference has);
- ``fsdp``   optional ZeRO-style fully-sharded data parallelism: batch is
             sharded over it like 'data', but params/EMA/optimizer moments
             are ALSO sharded over it (parallel/sharding.py), so per-chip
             state memory scales 1/fsdp — XLA inserts the per-layer weight
             all-gathers and gradient reduce-scatters. Only present in the
             mesh when fsdp > 1, so pure-DP/TP meshes (and their compiled
             HLO) are bit-identical to earlier rounds.
- ``model``  optional tensor parallelism over attention heads / MLP hidden
             (not needed for parity — the flagship is ~90M params — but
             exposed so the same train step scales, SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """How to carve the devices into ([pipe,] data[, fsdp], model) axes."""

    data: int = -1   # -1 = all remaining devices
    model: int = 1
    fsdp: int = 1    # >1 adds the 'fsdp' axis (ZeRO-sharded params/opt)
    pipe: int = 1    # >1 adds the outermost 'pipe' axis (GPipe stages)
    ep: int = 1      # >1 adds the 'ep' axis (MoE expert parallelism)
    seq: int = 1     # >1 adds the 'seq' axis (ring-attention context par.)

    def axis_sizes(self, n_devices: int) -> dict[str, int]:
        model = max(1, self.model)
        fsdp = max(1, self.fsdp)
        pipe = max(1, self.pipe)
        ep = max(1, self.ep)
        seq = max(1, self.seq)
        data = (self.data if self.data > 0
                else n_devices // (model * fsdp * pipe * ep * seq))
        sizes = {"data": data, "model": model}
        if seq > 1:
            # Next to 'model' (innermost rings): the ring's ppermutes are
            # neighbor-only, but the per-sublayer activation halo and the
            # gradient psum over 'seq' are latency-sensitive.
            sizes = {"data": data, "seq": seq, "model": model}
        if ep > 1:
            # Inner next to 'model': expert dispatch/combine are the
            # heaviest collectives (all-to-all-class) — fastest rings.
            sizes = {"data": data, "ep": ep,
                     **{k: v for k, v in sizes.items()
                        if k not in ("data", "ep")}}
        if fsdp > 1:
            sizes = {"data": data, "fsdp": fsdp,
                     **{k: v for k, v in sizes.items() if k != "data"}}
        if pipe > 1:
            # Outermost: stage handoffs are point-to-point (one ppermute
            # per tick), the lowest-bandwidth traffic in the program — they
            # can ride the slowest links (or DCN between slices).
            sizes = {"pipe": pipe, **sizes}
        if data * fsdp * model * pipe * ep * seq != n_devices:
            raise ValueError(
                f"mesh {'x'.join(map(str, sizes.values()))} does not cover "
                f"{n_devices} devices")
        return sizes

    def resolve(self, n_devices: int) -> tuple[int, ...]:
        return tuple(self.axis_sizes(n_devices).values())


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a ('data'[, 'fsdp'], 'model') mesh over the given devices.

    Uses ``mesh_utils.create_device_mesh`` when possible so the axes align
    with the physical ICI topology (contiguous model groups ride the fastest
    links); falls back to a plain reshape on virtual/CPU devices. The
    'fsdp' axis sits between 'data' and 'model' (weight all-gathers are
    per-layer and overlap with compute; TP's per-sublayer activation
    collectives stay on the innermost, fastest rings).
    """
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    sizes = spec.axis_sizes(len(devices))
    shape = tuple(sizes.values())
    names = tuple(sizes.keys())
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=names)


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the batch dim is sharded over ('fsdp' acts as extra DP)."""
    return (("data", "fsdp") if "fsdp" in mesh.axis_names else ("data",))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch (reference's per-rank batch, train_JPDVT.py:311)."""
    n = 1
    for ax in batch_axes(mesh):
        n *= mesh.shape[ax]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by data shards={n}")
    return global_batch // n


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up — the ``dist.init_process_group("nccl")``
    equivalent (reference train_JPDVT.py:111). On TPU pods with standard
    environment variables a bare ``jax.distributed.initialize()`` suffices;
    arguments are for manual clusters. Safe to call when already
    initialized."""
    import jax

    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def maybe_initialize_distributed(mesh_cfg=None) -> bool:
    """Multi-host bring-up for the CLIs, no-op on a single host.

    The reference trainer calls ``dist.init_process_group`` unconditionally
    (train_JPDVT.py:111) because torchrun always sets the env. JAX runs
    single-process by default, so this initializes ``jax.distributed`` only
    when a multi-process run is actually requested: an explicit coordinator
    in the config, ``mesh.distributed=force``, or a recognizable cluster
    environment (JAX coordination env, Slurm with >1 task, Open MPI with
    world size >1). Returns True if initialization was attempted.
    """
    import os

    mode = getattr(mesh_cfg, "distributed", "auto") if mesh_cfg else "auto"
    coordinator = getattr(mesh_cfg, "coordinator", "") if mesh_cfg else ""
    if mode == "never":
        return False
    if coordinator:
        nproc = getattr(mesh_cfg, "num_processes", 0) or None
        pid = getattr(mesh_cfg, "process_id", -1)
        initialize_distributed(coordinator, nproc, pid if pid >= 0 else None)
        return True
    env = os.environ
    detected = (
        mode == "force"
        or env.get("JAX_COORDINATOR_ADDRESS")
        or env.get("COORDINATOR_ADDRESS")
        or int(env.get("SLURM_NTASKS", "1") or 1) > 1
        or int(env.get("OMPI_COMM_WORLD_SIZE", "1") or 1) > 1
    )
    if not detected:
        return False
    initialize_distributed()
    return True


def process_shard(items: list, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """Strided multi-host work sharding, the TPU equivalent of the
    reference's ``paths[rank::world_size]`` (inference_ddp.py:325)."""
    i = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return items[i::n]
