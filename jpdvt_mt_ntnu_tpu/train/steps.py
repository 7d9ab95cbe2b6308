"""The jitted training step.

One XLA program does what the reference spreads across Python + NCCL
(reference: image_model/train_JPDVT.py:335-372): timestep draw, jigsaw
shuffle/mask, q-sampling, forward, loss, backward, AdamW update, EMA. Under
a batch-sharded input the gradient reduction over the 'data' mesh axis is
inserted by XLA (the DDP allreduce disappears). Donated state makes the
update in-place in HBM.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..core.diffusion import Diffusion
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainTask:
    """Static description of the jigsaw training task.

    Matches the reference's training_losses call site
    (train_JPDVT.py:357-367): block_size = image_size // grid,
    patch_size = model patch, one shared permutation per batch.
    """

    grid_size: int = 3
    block_size: int = 64
    patch_size: int = 16
    add_mask: bool = False
    shared_perm: bool = True
    ema_decay: float = 0.9999
    # Bias-corrected EMA warmup: effective decay ramps as
    # min(ema_decay, (1+step)/(10+step)) so the average tracks the params
    # from step 0 instead of the zero-ish init. The reference uses a fixed
    # .9999 from step 0 (train_JPDVT.py:37-46), which made EMA validation
    # read chance for ~20k steps on fast-converging runs (PERF.md, waves);
    # default off for parity.
    ema_warmup: bool = False
    # Warmup ramp origin: steps BEFORE this count as "not trained" for the
    # ramp, so a warm-started run (train.warm_start, step counter carried
    # over from the seed checkpoint) re-arms the fast early decay instead
    # of jumping straight to ema_decay. 0 = ramp from step 0 (cold start).
    ema_anchor: int = 0
    crop_pieces: int | None = None  # ImageNet --crop: inner piece crop px
    # Timestep sampling bias: 0 = uniform (reference parity,
    # train_JPDVT.py:354). >0 skews draws toward HIGH t via
    # t = (T-1)*u^(1/(1+bias)) — the positional-inference signal lives at
    # high t where the code input is uninformative; biasing there speeds up
    # learning the image->position mapping.
    t_bias: float = 0.0


def make_train_step(model, diffusion: Diffusion, optimizer: optax.GradientTransformation,
                    task: TrainTask, piece_code: jnp.ndarray,
                    donate: bool = True,
                    fused_adamw: dict | None = None,
                    grad_accum: int = 1,
                    mesh=None,
                    apply_fn: Callable | None = None) -> Callable:
    """Build ``train_step(state, images, rng) -> (state, metrics)``.

    images: (B, H, W, C) clean images in [-1, 1], NHWC, batch-sharded or not.
    rng: a jax PRNG key; it is folded with the step counter internally so
    passing the same key every call still gives fresh randomness.

    fused_adamw: optional AdamW hyperparameters (``{"lr": ..,
    "weight_decay": ..}``) enabling the single-pass fused AdamW+EMA update
    (state.fused_adamw_ema — measured marginally faster than the optax
    chain, never slower; see its docstring for hardware numbers). Must
    describe the SAME optimizer that built ``state.opt_state``;
    ``optimizer`` is then only used as a fallback documentation of
    intent. None = the plain optax chain.

    grad_accum: >1 runs the forward/backward as a ``lax.scan`` over
    ``grad_accum`` microbatches of B/grad_accum samples and applies ONE
    AdamW+EMA update on the averaged gradients — the reference's batch-96
    recipe (train_JPDVT.py:311) on hardware whose HBM can't hold the
    batch-96 activations. Activation memory scales with the microbatch;
    the cost is one params-sized fp32 accumulator. The update math is
    identical to the monolithic step (mean of microbatch means; tested in
    tests/test_grad_accum.py); the per-sample noise draws differ from the
    monolithic step's only through RNG key fan-out.

    mesh: optional device mesh; with grad_accum>1 it pins each microbatch
    to the same batch sharding the monolithic step uses (scan dim
    replicated, sample dim over the data/fsdp axes) so DP/FSDP/TP all
    compose with accumulation.

    apply_fn: optional replacement for ``model.apply`` with the same
    ``(params, x, t, code) -> (img, code_out)`` contract — this is how the
    pipelined forward (parallel/pipeline.make_pipeline_apply, stacked-block
    param layout) drops into the production step; everything downstream
    (loss, AdamW, EMA) is pytree-layout-agnostic.
    """
    apply_fn = apply_fn or model.apply

    def loss_fn(params, images, t, rng):
        def model_fn(x, t_orig, code):
            return apply_fn(params, x, t_orig, code)

        out = diffusion.training_losses(
            model_fn, images, t, piece_code, rng,
            block_size=task.block_size, patch_size=task.patch_size,
            add_mask=task.add_mask, grid_size=task.grid_size,
            shared_perm=task.shared_perm)
        return out["loss"].mean(), out

    def train_step(state: TrainState, images, rng):
        from ..ops import jigsaw

        # Batches may arrive as bf16/uint8 to save host->device bandwidth
        # (the tunnel to remote TPUs makes H2D the bottleneck otherwise);
        # the q-process math wants fp32.
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 127.5 - 1.0
        else:
            images = images.astype(jnp.float32)
        step_rng = jax.random.fold_in(rng, state.step)
        k_t, k_loss = jax.random.split(step_rng)
        if task.crop_pieces is not None:
            images = jigsaw.inner_crop_pieces(images, task.grid_size,
                                              task.crop_pieces)
        b = images.shape[0]
        # Uniform timesteps, as the reference draws torch.randint
        # (train_JPDVT.py:354). Spaced chain == full chain for training.
        if task.t_bias > 0:
            u = jax.random.uniform(k_t, (b,))
            t = jnp.minimum(
                (diffusion.schedule.T
                 * u ** (1.0 / (1.0 + task.t_bias))).astype(jnp.int32),
                diffusion.schedule.T - 1)  # include t = T-1
        else:
            t = jax.random.randint(k_t, (b,), 0, diffusion.schedule.T)

        if grad_accum > 1:
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum={grad_accum}")
            micro = b // grad_accum

            def to_micro(x):
                x = x.reshape(grad_accum, micro, *x.shape[1:])
                if mesh is not None:
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    from ..parallel.mesh import batch_axes

                    axes = batch_axes(mesh)
                    lead = axes[0] if len(axes) == 1 else axes
                    spec = P(*((None, lead) + (None,) * (x.ndim - 2)))
                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, spec))
                return x

            def body(carry, xs):
                g_acc, l_acc, cm_acc, im_acc = carry
                im, tt, kk = xs
                (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, im, tt, kk)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l,
                        cm_acc + aux["code_mse"].mean(),
                        im_acc + aux["img_mse"].mean()), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (g_sum, l_sum, cm_sum, im_sum), _ = jax.lax.scan(
                body,
                (zeros, jnp.float32(0), jnp.float32(0), jnp.float32(0)),
                (to_micro(images), t.reshape(grad_accum, micro),
                 jax.random.split(k_loss, grad_accum)))
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            loss = l_sum / grad_accum
            aux_means = {"code_mse": cm_sum / grad_accum,
                         "img_mse": im_sum / grad_accum}
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, images, t, k_loss)
            aux_means = {"code_mse": aux["code_mse"].mean(),
                         "img_mse": aux["img_mse"].mean()}
        if task.ema_warmup:
            s = (state.step + 1 - task.ema_anchor).astype(jnp.float32)
            ema_decay = jnp.minimum(task.ema_decay, (1.0 + s) / (10.0 + s))
        else:
            ema_decay = task.ema_decay
        if fused_adamw is not None:
            from .state import fused_adamw_ema

            params, ema, opt_state = fused_adamw_ema(
                state.params, grads, state.ema_params, state.opt_state,
                ema_decay=ema_decay, **fused_adamw)
        else:
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            ema = optax.incremental_update(params, state.ema_params,
                                           1.0 - ema_decay)
        new_state = TrainState(step=state.step + 1, params=params,
                               ema_params=ema, opt_state=opt_state)
        metrics = {
            "loss": loss,
            **aux_means,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
