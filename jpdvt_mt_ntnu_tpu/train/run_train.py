"""CLI training loop — the reference's torchrun trainers, TPU-native.

Usage:
    python -m jpdvt_mt_ntnu_tpu.train.run_train \
        data.dataset=imagenet data.data_path=/data/imagenet/train \
        model.image_size=192 task.grid_size=3 task.crop=true \
        train.epochs=500 data.global_batch_size=96

Covers both reference trainers (train_JPDVT.py and train_JPDVT_4x4.py —
the 4x4 case is just task.grid_size=4 model.name=JPDVT-T
model.image_size=256). Multi-host: run the same command on every host after
``jax.distributed.initialize``; batches shard over the 'data' mesh axis and
XLA reduces gradients over ICI.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import create_diffusion
from ..models import create_model
from ..parallel import MeshSpec, make_mesh, shard_batch
from ..utils.config import Config, apply_overrides
from ..utils.logging import MetricWriter, auto_experiment_dir, rank0_logger
from ..utils.pos_embed import grid_code
from .checkpoint import CheckpointManager
from .state import TrainState, create_train_state, make_optimizer
from .steps import TrainTask, make_train_step
from .validate import Validator


def build_datasets(cfg: Config):
    from ..data import (ImageFolderDataset, Loader, METDataset,
                        SyntheticPuzzles, TEXMETDataset)

    d, size = cfg.data, cfg.model.image_size
    if d.dataset == "met":
        train, val = METDataset(d.data_path, "train"), METDataset(d.data_path, "val")
    elif d.dataset == "texmet":
        train = TEXMETDataset(d.data_path, "train", size)
        val = TEXMETDataset(d.data_path, "val", size)
    elif d.dataset == "synthetic":
        train = SyntheticPuzzles(288 if cfg.task.crop else size,
                                 n=d.synthetic_n,
                                 position_cues=d.synthetic_position_cues,
                                 cues=d.synthetic_cues or None,
                                 hard_frac=d.synthetic_hard_frac)
        val = SyntheticPuzzles(288 if cfg.task.crop else size, n=128, seed=7,
                               position_cues=d.synthetic_position_cues,
                               cues=d.synthetic_cues or None)
    else:
        # ImageNet-style folder; reference always center-crops to 288 and
        # (with --crop) cuts 96->64 pieces to get 192 (train_JPDVT.py:289-294,
        # :345-349).
        load_size = 288 if cfg.task.crop else size
        train = ImageFolderDataset(d.data_path, load_size)
        val = train
    loader = Loader(train, d.global_batch_size, shuffle=True,
                    seed=cfg.train.global_seed, num_workers=d.num_workers,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    return loader, val


# Exit code signalling "preempted after a clean checkpoint" — auto-resume
# wrappers (scripts/train_autoresume.sh) relaunch on it.
PREEMPTED_EXIT = 42


class _PreemptionGuard:
    """Elastic-training upgrade (no reference equivalent): SIGTERM/SIGINT
    request a CLEAN stop — the loop finishes the in-flight step, saves a
    full checkpoint, and exits with PREEMPTED_EXIT so a wrapper can
    relaunch with ``train.resume``. Handlers are restored on exit so
    library callers (tests) keep their signal state."""

    def __init__(self, enabled: bool = True):
        self.flag = threading.Event()
        self._prev: dict = {}
        self._enabled = enabled and threading.current_thread() is threading.main_thread()

    def __enter__(self):
        if self._enabled:
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(
                    sig, lambda *_: self.flag.set())
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False

    @property
    def preempted(self) -> bool:
        return self.flag.is_set()


def main(argv=None) -> int:
    from ..utils.platform import (apply_matmul_precision, ensure_platform,
                                  init_compilation_cache)

    ensure_platform()
    init_compilation_cache()
    cfg = apply_overrides(Config(), sys.argv[1:] if argv is None else argv)
    apply_matmul_precision(cfg.model.matmul_precision)
    from ..parallel import maybe_initialize_distributed

    maybe_initialize_distributed(cfg.mesh)
    is_main = jax.process_index() == 0

    if cfg.train.exp_dir:
        exp_dir = cfg.train.exp_dir if is_main else None
        if is_main:
            os.makedirs(exp_dir, exist_ok=True)
    else:
        exp_dir = auto_experiment_dir(
            cfg.train.results_dir, cfg.data.dataset, cfg.model.name,
            crop=cfg.task.crop, with_mask=cfg.task.add_mask) if is_main else None
    if jax.process_count() > 1:
        # Every host must agree on the checkpoint directory (Orbax saves of
        # globally-sharded state are collective); broadcast host 0's pick.
        from jax.experimental import multihost_utils

        buf = np.zeros(512, np.uint8)
        if exp_dir:
            raw = exp_dir.encode()[:512]
            buf[:len(raw)] = np.frombuffer(raw, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        exp_dir_shared = bytes(buf[buf != 0]).decode()
    else:
        exp_dir_shared = exp_dir
    logger = rank0_logger(is_main, exp_dir)
    writer = MetricWriter(exp_dir or ".", use_wandb=cfg.train.wandb,
                          run_name=(exp_dir or "").split("/")[-1],
                          config=cfg.to_dict(), is_main=is_main,
                          tags=[cfg.model.name, cfg.data.dataset,
                                f"grid{cfg.task.grid_size}"])
    logger.info(f"Config:\n{cfg.to_json()}")

    mesh = make_mesh(MeshSpec(cfg.mesh.data, cfg.mesh.model,
                              fsdp=cfg.mesh.fsdp, pipe=cfg.mesh.pipe,
                              ep=cfg.mesh.ep, seq=cfg.mesh.seq))
    pipelined = "pipe" in mesh.axis_names
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    attn_impl = cfg.model.attn_impl
    seq_mesh = None
    if "seq" in mesh.axis_names:
        # Context parallelism: tokens shard over 'seq', attention runs as
        # a shard_map ring (parallel/sequence.py) — the one impl that can
        # compute attention without gathering the full sequence.
        logger.info("mesh.seq>1: attention = ring (sequence parallel)")
        attn_impl, seq_mesh = "ring", mesh
    elif (mesh.shape["model"] > 1 or "fsdp" in mesh.axis_names
            or "ep" in mesh.axis_names or pipelined) \
            and attn_impl != "xla":
        # The Pallas attention kernels are not GSPMD-partitionable over the
        # 'model' axis (and would force replication of fsdp-sharded
        # operands); XLA einsum attention shards head-wise for free.
        logger.info("mesh.model/fsdp>1: forcing attn_impl=xla (Pallas "
                    "kernels are not GSPMD-partitionable)")
        attn_impl = "xla"
    model, model_cfg = create_model(cfg.model.name, cfg.model.image_size,
                                    dtype=dtype, attn_impl=attn_impl,
                                    seq_mesh=seq_mesh,
                                    **cfg.model.overrides())
    diffusion = create_diffusion(cfg.diffusion.timestep_respacing,
                                 cfg.diffusion.noise_schedule,
                                 cfg.diffusion.predict_xstart,
                                 cfg.diffusion.sigma_small)
    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                               cfg.train.grad_clip)
    grid = cfg.task.grid_size
    # Multi-grid: the DiT is grid-agnostic (grid only affects the jigsaw
    # task wiring), so one parameter set can train on several grids at
    # once — one jitted step per grid, cycled per training step. The
    # reference needs a separate model/trainer per grid.
    grids = ([int(g) for g in str(cfg.task.multi_grid).split(",") if g]
             if cfg.task.multi_grid else [grid])
    for g in grids:
        toks = cfg.model.image_size // model_cfg.patch_size
        if cfg.model.image_size % g or toks % g:
            raise SystemExit(
                f"task grid {g} must divide image_size "
                f"({cfg.model.image_size}) and tokens/side ({toks})")

    def make_task(g: int, ema_anchor: int = 0) -> TrainTask:
        return TrainTask(
            grid_size=g,
            block_size=cfg.model.image_size // g,
            patch_size=model_cfg.patch_size,
            add_mask=cfg.task.add_mask,
            shared_perm=cfg.task.shared_perm,
            ema_decay=cfg.train.ema_decay,
            ema_warmup=cfg.train.ema_warmup,
            ema_anchor=ema_anchor,
            crop_pieces=cfg.model.image_size // g if cfg.task.crop else None,
            t_bias=cfg.train.t_bias,
        )

    # Pipeline parallelism: the block stack runs the GPipe schedule over
    # the 'pipe' axis (parallel/pipeline.py); the train step takes the
    # pipelined forward as a drop-in apply_fn and the state moves to the
    # stacked-blocks layout (converted back to the plain layout at every
    # checkpoint boundary, so checkpoints stay interchangeable).
    if pipelined:
        from ..parallel.pipeline import (convert_state, make_pipeline_apply,
                                         pipeline_state_shardings,
                                         stack_block_params,
                                         unstack_block_params)

        apply_fn = make_pipeline_apply(
            model_cfg, mesh, cfg.mesh.pipe_microbatches or None)
        to_ckpt_layout = lambda s: convert_state(s, unstack_block_params)  # noqa: E731
        plain_params = unstack_block_params
    else:
        apply_fn = None
        to_ckpt_layout = plain_params = lambda s: s  # noqa: E731

    # Plain AdamW (no grad clip) takes the single-pass fused update path
    # (state.fused_adamw_ema); clipped runs keep the general optax chain.
    fused = (dict(lr=cfg.train.lr, weight_decay=cfg.train.weight_decay)
             if cfg.train.grad_clip is None else None)

    state = create_train_state(model, model_cfg, jax.random.key(cfg.train.global_seed),
                               optimizer)
    if pipelined:
        state = convert_state(state, stack_block_params)
    # Tensor parallelism for real: params, EMA AND optimizer moments are
    # placed with the Megatron specs (parallel/sharding.py) — with
    # mesh.model>1 each chip holds 1/model of every sharded matrix and XLA
    # inserts the per-sublayer reductions. mesh.fsdp>1 additionally
    # ZeRO-shards the whole state over the 'fsdp' axis (per-layer weight
    # all-gathers + gradient reduce-scatters, inserted by GSPMD).
    # mesh.model=fsdp=1 degenerates to replicated (pure DP), identical to
    # the reference's DDP.
    from ..parallel import state_shardings

    state_sharding = (pipeline_state_shardings(state, mesh) if pipelined
                      else state_shardings(state, mesh))
    state = jax.device_put(state, state_sharding)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    logger.info(f"{cfg.model.name}: {n_params / 1e6:.1f}M params, "
                f"mesh={dict(mesh.shape)}")

    if cfg.train.resume and cfg.train.warm_start:
        raise SystemExit(
            "train.resume and train.warm_start are mutually exclusive: "
            "resume continues a run in place; warm_start seeds a NEW run "
            "(fresh exp_dir checkpoints, EMA reset, warmup re-armed)")
    ckpt = CheckpointManager(
        cfg.train.resume
        or (f"{exp_dir_shared}/checkpoints" if exp_dir_shared else "checkpoints"))
    ema_anchor = 0
    if cfg.train.resume:
        if ckpt.latest_step() is None:
            raise FileNotFoundError(
                f"train.resume={cfg.train.resume!r} contains no checkpoints "
                "— refusing to silently restart from scratch")
        # Restored arrays land on one device; re-place them with the same
        # (TP-aware) shardings the fresh state uses. Checkpoints are always
        # written in the PLAIN param layout, so pipelined runs restore
        # through a plain template and re-stack.
        if pipelined:
            restored = ckpt.restore(to_ckpt_layout(state))
            state = jax.device_put(
                convert_state(restored, stack_block_params), state_sharding)
        else:
            state = jax.device_put(ckpt.restore(state), state_sharding)
        logger.info(f"Resumed from step {int(state.step)}")
    elif cfg.train.warm_start:
        # Cross-geometry warm start (the grid-ladder curriculum, PERF.md
        # "24x24"): the DiT's param tree is geometry-independent (patch
        # embed is a Dense over patch_dim; pos tables are computed), so a
        # checkpoint from a previous rung restores verbatim. Params, opt
        # moments and the step counter carry over (the waves stream cursor
        # continues, never repeating data), but the EMA belongs to the OLD
        # task — reset it to the restored params and re-arm the warmup ramp
        # at the restore step, else EMA validation/eval lags raw by 10-20k
        # steps at decay .9999 (the round-3 24x24 cost).
        ws = cfg.train.warm_start
        if ws.endswith((".json", ".npz")):
            # Params-only warm start from a DURABLE ARTIFACT
            # (tools/export_ckpt.py: a *.manifest.json split-npz export,
            # sha256-verified on load, or a bare flattened-params npz).
            # Artifacts carry EMA weights only, so optimizer moments start
            # fresh (the just-initialized opt_state is shape-correct
            # zeros); the step counter comes from the manifest so the
            # anchored step budget and the waves stream cursor continue
            # where the exporting run stopped. This is what makes the
            # committed ladder artifacts trainable seeds, not just
            # eval/serve weights (ROADMAP round 5).
            from ..tools.torch_convert import load_artifact_params

            loaded, ws_step = load_artifact_params(ws)

            def _take(leaf, v):
                v = np.asarray(v)
                if tuple(v.shape) != tuple(leaf.shape):
                    raise SystemExit(
                        f"train.warm_start={ws!r}: artifact param shape "
                        f"{tuple(v.shape)} != model {tuple(leaf.shape)} — "
                        "wrong model config for this artifact")
                return jnp.asarray(v, dtype=leaf.dtype)

            try:
                params = jax.tree.map(_take, state.params, loaded)
            except ValueError as e:
                raise SystemExit(
                    f"train.warm_start={ws!r}: artifact param tree does "
                    f"not match the model ({e})") from e
            restored = TrainState(
                step=jnp.asarray(ws_step,
                                 dtype=jnp.asarray(state.step).dtype),
                params=params,
                ema_params=jax.tree.map(jnp.copy, params),
                opt_state=state.opt_state)
            src = "artifact, params-only, fresh optimizer"
        else:
            warm = CheckpointManager(ws)
            if warm.latest_step() is None:
                raise FileNotFoundError(
                    f"train.warm_start={ws!r} contains no checkpoints")
            restored = warm.restore(to_ckpt_layout(state))
            warm.close()
            restored = TrainState(
                step=restored.step, params=restored.params,
                ema_params=jax.tree.map(jnp.copy, restored.params),
                opt_state=restored.opt_state)
            src = "checkpoint"
        if pipelined:
            restored = convert_state(restored, stack_block_params)
        state = jax.device_put(restored, state_sharding)
        ema_anchor = int(state.step)
        logger.info(f"Warm-started from {ws} [{src}] at step "
                    f"{ema_anchor} (EMA reset to params, warmup re-armed)")

    grid_steps = [
        make_train_step(model, diffusion, optimizer,
                        make_task(g, ema_anchor=ema_anchor),
                        jnp.asarray(grid_code(model_cfg.code_dim, g)),
                        fused_adamw=fused,
                        grad_accum=cfg.train.grad_accum, mesh=mesh,
                        apply_fn=apply_fn)
        for g in grids
    ]

    loader, val_ds = build_datasets(cfg)
    validators = {
        g: Validator(model, model_cfg, grid_size=g,
                     sampling_steps=cfg.diffusion.sampling_steps,
                     sampler_mode=cfg.diffusion.sampler_mode,
                     crop_pieces=cfg.model.image_size // g
                     if cfg.task.crop else None)
        for g in grids
    }

    def validate_all(params, ds) -> dict:
        out = {}
        for g, v in validators.items():
            m = v(params, ds)
            out.update(m if len(grids) == 1
                       else {f"{k}_g{g}": val for k, val in m.items()})
        return out
    rng = jax.random.key(cfg.train.global_seed)

    device_data = None
    stream_batcher = None
    if cfg.data.device_stream:
        ds = loader.dataset
        if getattr(ds, "cues", None) != "waves":
            raise NotImplementedError("data.device_stream is waves-only")
        # Never-repeating stream: item index = global step counter * batch.
        # Keep the index below the val set's parameter stream (seed 7 ->
        # base 7,000,021 in _wave_params) so train and val never collide.
        stream_batcher = ds.device_batcher()
    elif cfg.data.device_cache:
        if jax.process_count() > 1:
            raise NotImplementedError(
                "data.device_cache is a single-host optimization (the whole "
                "dataset is staged into local HBM); use the streaming loader "
                "for multi-host runs")
        from concurrent.futures import ThreadPoolExecutor

        ds = loader.dataset
        if getattr(ds, "cues", None) == "waves":
            # Synthesize directly on device (seconds vs ~45 min of host
            # sin() for a 16k-image set on a 1-core VM).
            stack = ds.device_generate_all()
        else:
            with ThreadPoolExecutor(max(4, cfg.data.num_workers)) as pool:
                stack = np.stack(list(pool.map(ds.__getitem__, range(len(ds)))))
        device_data = shard_batch(
            {"x": jnp.asarray(stack, dtype=jnp.bfloat16)}, mesh)["x"]
        logger.info(f"device-cached dataset: {device_data.shape} "
                    f"({device_data.nbytes / 1e6:.0f} MB bf16 in HBM)")

    @jax.jit
    def _augment(batch, dy, dx, fh, fv):
        # Label-consistent clean-image augmentation on device (traced
        # operands: ONE compiled program for all shifts/flips).
        batch = jnp.roll(batch, (dy, dx), axis=(1, 2))
        batch = jnp.where(fh, batch[:, :, ::-1], batch)
        return jnp.where(fv, batch[:, ::-1], batch)

    # Stream cursor in ITEMS; resume continues the never-repeating stream
    # where the checkpointed step left off.
    stream_pos = [int(state.step) * cfg.data.global_batch_size]

    def epoch_batches(epoch: int):
        if stream_batcher is not None:
            from ..parallel import batch_sharding

            b = cfg.data.global_batch_size
            for _ in range(max(1, len(loader))):
                lo, stream_pos[0] = stream_pos[0], stream_pos[0] + b
                yield jax.device_put(stream_batcher(range(lo, lo + b)),
                                     batch_sharding(mesh, 4))
            return
        if device_data is None:
            loader.set_epoch(epoch)
            for batch in loader:
                yield shard_batch({"x": jnp.asarray(batch)}, mesh)["x"]
            return
        n = device_data.shape[0]
        b = cfg.data.global_batch_size
        erng = np.random.default_rng(cfg.train.global_seed * 100003 + epoch)
        perm = erng.permutation(n)
        for i in range(n // b):
            batch = device_data[jnp.asarray(perm[i * b:(i + 1) * b])]
            if cfg.data.device_cache_augment:
                h = batch.shape[1]
                batch = _augment(batch,
                                 jnp.int32(erng.integers(0, h)),
                                 jnp.int32(erng.integers(0, h)),
                                 jnp.bool_(erng.random() < 0.5),
                                 jnp.bool_(erng.random() < 0.5))
            yield batch

    # train.epochs is a TOTAL budget counted from this RUN's starting step:
    # target = anchor + epochs*steps_per_epoch, so a resumed run (watchdog
    # relaunch, preemption) trains only the remainder instead of re-adding
    # the full budget — a late wedge on a multi-hour rung must not double
    # its wall-clock. The anchor is 0 for fresh runs and the donor step for
    # warm starts (train.warm_start restores the step counter so the data
    # stream cursor and EMA ramp stay continuous); it is persisted in the
    # exp dir so relaunches — which resume from own checkpoints WITHOUT the
    # warm_start flag — recompute the same target.
    steps_per_epoch = max(1, len(loader))
    anchor_path = (os.path.join(exp_dir_shared, "step_anchor.json")
                   if exp_dir_shared else None)
    if anchor_path and os.path.exists(anchor_path):
        with open(anchor_path) as f:
            start_anchor = int(json.load(f)["start_step"])
    else:
        start_anchor = int(state.step)
        if anchor_path and is_main:
            with open(anchor_path, "w") as f:
                json.dump({"start_step": start_anchor}, f)
    target_steps = start_anchor + cfg.train.epochs * steps_per_epoch
    logger.info(f"Training for {cfg.train.epochs} epochs, "
                f"{steps_per_epoch} steps/epoch (anchor {start_anchor}, "
                f"target step {target_steps})")
    # Losses stay ON DEVICE until the log boundary; the host reads one mean
    # back per window. A per-step float(...) would block on the device every
    # step and serialize dispatch (the async dispatch queue is what hides
    # H2D + scheduling latency). Same for the step counter: train_step
    # increments by exactly 1, so the host mirrors it without a sync.
    step = int(state.step)
    window_losses: list = []
    window_start = time.time()
    guard = _PreemptionGuard()
    guard.__enter__()
    for epoch in range(cfg.train.epochs):
        if guard.preempted or step >= target_steps:
            break
        for batch in epoch_batches(epoch):
            if guard.preempted or step >= target_steps:
                break
            state, metrics = grid_steps[step % len(grid_steps)](
                state, batch, rng)
            window_losses.append(metrics["loss"])
            step += 1
            if step % cfg.train.log_every == 0:
                avg = float(jnp.stack(window_losses).mean())  # sync point
                dt = time.time() - window_start
                sps = len(window_losses) / dt if dt > 0 else 0.0
                logger.info(f"(step={step:08d}) Train Loss: {avg:.4f}, "
                            f"Train Steps/Sec: {sps:.2f}")
                writer.log({"train_loss": avg, "steps_per_sec": sps,
                            "epoch": epoch}, step)
                window_losses.clear()
                window_start = time.time()
            if step % cfg.train.ckpt_every == 0:
                # Orbax save and the validation solve are collective over
                # globally-sharded state — every host participates; only
                # logging/metrics stay rank-0 (the reference's rank-0
                # torch.save does not translate to sharded pytrees).
                ckpt.save(to_ckpt_layout(state),
                          metadata={"config": cfg.to_dict(),
                                           "step": step} if is_main else None)
                logger.info(f"Saved checkpoint at step {step}")
            val_every = cfg.train.val_every or cfg.train.ckpt_every
            if step % val_every == 0:
                val = validate_all(plain_params(state.ema_params), val_ds)
                # EMA decay .9999 needs ~20k steps to converge to the
                # trained function; early-run EMA solves are near-init
                # garbage. Validate the RAW weights too so fast-converging
                # runs aren't misread as failures (same compiled program).
                raw = {f"raw_{k}": v
                       for k, v in validate_all(plain_params(state.params),
                                                val_ds).items()}
                logger.info(f"Validation: {val} | raw: {raw}")
                writer.log({**val, **raw}, step)
                # Don't bill validation time to steps/s: flush the loss
                # window along with the clock, else the next log divides a
                # full window's steps by only the post-validation elapsed.
                window_losses.clear()
                window_start = time.time()
    # One exit path for BOTH clean completion and preemption: the signal can
    # land anywhere (including between epochs), so the sentinel decision is
    # made here, after the loops unwind. On multi-host clusters the scheduler
    # delivers the signal to every host, so the collective save is safe.
    guard.__exit__()
    preempted = guard.preempted
    ckpt.save(to_ckpt_layout(state),
              metadata={"config": cfg.to_dict(),
                        "preempted" if preempted else "final": True}
              if is_main else None, force=True)
    if preempted:
        ckpt.wait()
        logger.info(f"Preempted: checkpoint saved at step {step}")
        writer.finish(summary={"preempted_at_step": step})
        return PREEMPTED_EXIT
    val = validate_all(plain_params(state.ema_params), val_ds)
    logger.info(f"Final validation: {val}")
    writer.finish(summary=val)
    ckpt.wait()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
