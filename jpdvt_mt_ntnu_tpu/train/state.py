"""Train state: params + EMA + optimizer state as one pytree.

Mirrors the reference checkpoint contents {"model","ema","opt","train_steps"}
(reference: image_model/train_JPDVT.py:410-418). EMA covers ALL params with
decay 0.9999 (train_JPDVT.py:37-46); the frozen pos_embed of the reference is
a compile-time constant here, so EMA-over-frozen-buffer is a no-op by
construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray          # () int32
    params: Any
    ema_params: Any
    opt_state: Any


def create_train_state(model, cfg, rng, optimizer: optax.GradientTransformation) -> TrainState:
    """Init params exactly like the reference's constructor-time init."""
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.in_channels))
    code = jnp.zeros((1, cfg.num_tokens, cfg.code_dim))
    params = model.init(rng, x, jnp.zeros((1,), jnp.int32), code)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                   grad_clip: float | None = None) -> optax.GradientTransformation:
    """AdamW(lr=1e-4, wd=0) per reference train_JPDVT.py:281, plus an
    optional global-norm clip the reference lacks (off by default)."""
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
