"""One typed config for every entry point, with CLI overrides.

The reference mixes argparse, module-level constants with cluster-absolute
paths, and shell env (SURVEY.md §5.6). Here a single dataclass tree feeds
training, evaluation and serving; any field is overridable on the command
line as ``--section.field=value``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Sequence


@dataclasses.dataclass
class ModelConfig:
    name: str = "JPDVT"
    image_size: int = 192
    compute_dtype: str = "bfloat16"   # "float32" for parity runs
    attn_impl: Optional[str] = None   # None = auto
    # Parity runs (SURVEY.md §7.3 item 2): "highest" forces fp32 matmuls on
    # the MXU (the analogue of disabling the reference's TF32,
    # train_JPDVT.py:5-6); None keeps the backend default (fast).
    matmul_precision: Optional[str] = None
    # "int8": quantized serving path (ops/quant.py) — weight+activation
    # int8 on the big per-block matmuls. Eval/serve only; checkpoints are
    # unchanged (quantization is in-graph from the fp32 params).
    quant: str = ""
    # 0 = use the registry values; override for scaled-down smoke runs.
    depth: int = 0
    hidden_size: int = 0
    num_heads: int = 0
    patch_size: int = 0
    # >0 overrides the registry's MoE expert count (models/moe.py);
    # the registry's JPDVT-MoE carries its own default.
    moe_experts: int = 0
    moe_capacity: float = 0.0

    def overrides(self) -> dict:
        out = {}
        if self.quant:
            out["quant"] = self.quant
        if self.depth:
            out["depth"] = self.depth
        if self.hidden_size:
            out["hidden_size"] = self.hidden_size
        if self.num_heads:
            out["num_heads"] = self.num_heads
        if self.patch_size:
            out["patch_size"] = self.patch_size
        if self.moe_experts:
            out["moe_experts"] = self.moe_experts
        if self.moe_capacity:
            out["moe_capacity"] = self.moe_capacity
        return out


@dataclasses.dataclass
class DiffusionConfig:
    timestep_respacing: str = ""      # training default: full 1000 steps
    # Eval respacing (inference.py:48); accepts "250", "ddim25", "10,20".
    sampling_steps: str = "250"
    noise_schedule: str = "linear"
    predict_xstart: bool = True
    sigma_small: bool = True
    sampler_mode: str = "faithful"    # faithful | fast | iterative | ddim


@dataclasses.dataclass
class TaskConfig:
    grid_size: int = 3
    # Multi-grid training: comma-separated grids (e.g. "3,4,6,12") cycled
    # per step so ONE checkpoint solves every listed grid — the reference
    # trains a separate model per grid (train_JPDVT.py vs
    # train_JPDVT_4x4.py). Every grid must divide image_size/patch_size.
    # Empty = single-grid (grid_size; reference parity).
    multi_grid: str = ""
    add_mask: bool = False
    shared_perm: bool = True
    crop: bool = False                # ImageNet inner-piece crop path


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"        # imagenet | met | texmet | synthetic
    data_path: str = ""
    num_workers: int = 8
    global_batch_size: int = 96       # train_JPDVT.py default (argparse :651)
    # Stage the whole dataset in device HBM once (bf16) and gather batches
    # on-device — removes per-step H2D entirely. For datasets that fit
    # (synthetic, MET-scale); augmenting datasets re-stage per epoch.
    device_cache: bool = False
    # On-device augmentation of device-cached batches: random circular roll
    # + horizontal/vertical flips applied to the CLEAN image before the
    # jigsaw shuffle (targets derive from the augmented image, so this is
    # always label-consistent).
    device_cache_augment: bool = False
    synthetic_n: int = 2048           # synthetic dataset size
    # False = pure-texture synthetic puzzles (the HARD task: position must
    # be inferred from texture continuity alone, like the real datasets);
    # True adds faint luminance ramps for fast learnability demos.
    synthetic_position_cues: bool = True
    # Cue regime for the synthetic task: "" derives from
    # synthetic_position_cues (True->"coords", False->"none");
    # "natural" = weak photometric cues (vignette + lighting gradients);
    # "waves" = relational regime (stationary low-freq plane waves — a
    # single piece carries zero position signal; only cross-piece field
    # inference places pieces).
    synthetic_cues: str = ""
    # waves-only: probability of forcing a draw into the measured hard
    # region of the 20x20 cliff (k=2, angle>1.2rad, fmax>0.85 — PERF.md
    # "20x20 plateau"). 0 = the natural draw distribution (8.8% hard).
    synthetic_hard_frac: float = 0.0
    # waves-only: synthesize a FRESH batch on device every step (infinite
    # data — each image is ~10 wave parameters, so any finite cache is
    # memorizable; streaming removes that failure mode). synthetic_n then
    # only defines the nominal epoch length.
    device_stream: bool = False


@dataclasses.dataclass
class TrainConfig:
    # Total budget: epochs*steps_per_epoch is an ABSOLUTE step target, so a
    # resumed run trains only the remainder (a relaunch must not re-add the
    # full budget to a multi-hour rung).
    epochs: int = 500
    lr: float = 1e-4
    weight_decay: float = 0.0
    ema_decay: float = 0.9999
    # Ramp the EMA decay as min(ema_decay, (1+step)/(10+step)) so early
    # checkpoints carry a usable average (reference parity = fixed decay).
    ema_warmup: bool = False
    grad_clip: Optional[float] = None
    # >1 scans the step over this many microbatches of
    # global_batch_size/grad_accum samples and applies one update on the
    # averaged grads — the reference's batch-96 recipe on devices whose
    # HBM can't hold the full-batch activations.
    grad_accum: int = 1
    t_bias: float = 0.0               # >0 skews timestep draws toward high t
    log_every: int = 100
    ckpt_every: int = 50_000
    # Validate (full-sampler solve of 100 val images, ~30 s) more often
    # than checkpointing: a full-state save costs minutes of D2H over a
    # remote-TPU tunnel, the solve does not. 0 = validate at ckpt_every.
    val_every: int = 0
    global_seed: int = 0
    results_dir: str = "results"
    # Explicit experiment dir (skips the auto-numbered name) — lets
    # auto-resume wrappers address the checkpoint dir deterministically.
    exp_dir: str = ""
    resume: str = ""                  # ckpt dir to resume from
    # Cross-geometry warm start (the grid-ladder mechanism, PERF.md
    # "24x24"): restore params/opt/step from this checkpoint dir, but
    # RESET the EMA to the restored params and re-arm the ema_warmup ramp
    # at the restore step — a fixed .9999 EMA lags a freshly warm-started
    # task by 10-20k steps, which round 3 paid on the 24x24 rung. Unlike
    # ``resume``, checkpoints keep saving into THIS run's exp_dir.
    warm_start: str = ""
    wandb: bool = False


@dataclasses.dataclass
class EvalConfig:
    checkpoint: str = ""
    batch_size: int = 64
    seed: int = 0
    assignment: str = "greedy"        # greedy | hungarian
    # Test-time re-scramble voting: solve each puzzle under `votes`
    # arrangements and assign once on the averaged distance matrices
    # (costs votes x solve time; see PERF.md round-4 "20x20 plateau").
    votes: int = 1
    use_ema: bool = True
    # Evaluate despite a checkpoint-metadata/config conflict (model name,
    # image size, grid) — guards against the reference's '4_Fail' class of
    # silent-garbage runs (SURVEY.md §6).
    allow_mismatch: bool = False
    logs_dir: str = "logs"
    results_dir: str = "eval_out"
    save_images: bool = False
    limit: int = 0                    # 0 = all


@dataclasses.dataclass
class MeshConfig:
    data: int = -1
    model: int = 1
    # >1 fully-shards params/EMA/optimizer state over an extra 'fsdp' mesh
    # axis (ZeRO-3); the batch shards over data x fsdp combined.
    fsdp: int = 1
    # >1 pipelines the DiT block stack over an extra outermost 'pipe' mesh
    # axis (GPipe schedule via shard_map + ppermute, parallel/pipeline.py);
    # model.depth must divide by it. Checkpoints stay layout-compatible
    # with non-pipelined runs.
    pipe: int = 1
    # Microbatches per pipelined step (0 = 2*pipe; more microbatches =
    # smaller pipeline bubble). The global batch must divide by it.
    pipe_microbatches: int = 0
    # >1 shards the MoE expert dim over an 'ep' mesh axis (models/moe.py);
    # requires a MoE model (model.name=JPDVT-MoE or model.moe_experts>0).
    ep: int = 1
    # >1 shards activations over tokens on a 'seq' mesh axis and runs
    # attention as a ring (parallel/sequence.py, ppermute + online
    # softmax); num_tokens must divide by it. Context parallelism for
    # long-sequence geometries (576+ tokens at grid 24@384 and beyond).
    seq: int = 1
    # Multi-host bring-up (the reference's unconditional
    # dist.init_process_group, train_JPDVT.py:111). "auto" initializes
    # jax.distributed when a cluster is detectable (explicit coordinator
    # below, TPU pod metadata, Slurm/OMPI env); "never"/"force" override.
    distributed: str = "auto"         # auto | never | force
    coordinator: str = ""             # host:port for manual clusters
    num_processes: int = 0
    process_id: int = -1


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    task: TaskConfig = dataclasses.field(default_factory=TaskConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)


def _coerce(value: str, typ: Any) -> Any:
    if typ in (Optional[float], float):
        return float(value)
    if typ in (Optional[int], int):
        return int(value)
    if typ is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if typ in (Optional[str], str):
        return value
    return json.loads(value)


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``section.field=value`` strings (also accepts --prefixed)."""
    for item in overrides:
        item = item.lstrip("-")
        if "=" not in item:
            raise ValueError(f"override must be section.field=value: {item!r}")
        path, value = item.split("=", 1)
        parts = path.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        field = parts[-1]
        typ = {f.name: f.type for f in dataclasses.fields(obj)}.get(field)
        if typ is None:
            raise KeyError(f"unknown config field {path!r}")
        resolved = {"Optional[float]": Optional[float], "Optional[int]": Optional[int],
                    "Optional[str]": Optional[str], "float": float, "int": int,
                    "bool": bool, "str": str}.get(str(typ).replace("typing.", ""), typ)
        setattr(obj, field, _coerce(value, resolved))
    return cfg


def parse_config(argv: Sequence[str]) -> Config:
    return apply_overrides(Config(), list(argv))


def config_from_dict(d: dict) -> Config:
    """Rebuild a Config from a ``to_dict()``/run_config.json dump.

    Unknown keys are ignored (older dumps may lack fields added since, and
    newer dumps may carry fields an older reader doesn't know): the result
    is Config defaults overlaid with every recognized recorded value."""
    cfg = Config()
    for section_field in dataclasses.fields(cfg):
        sub = d.get(section_field.name)
        if not isinstance(sub, dict):
            continue
        obj = getattr(cfg, section_field.name)
        known = {f.name for f in dataclasses.fields(obj)}
        for k, v in sub.items():
            if k in known:
                setattr(obj, k, v)
    return cfg
