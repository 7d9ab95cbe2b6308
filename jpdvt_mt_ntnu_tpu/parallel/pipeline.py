"""Pipeline parallelism (GPipe) over a ``'pipe'`` mesh axis.

The reference has no pipeline story at all — its only parallelism is DDP
(reference: image_model/train_JPDVT.py:231). On TPU, pipelining is the
standard way to scale a deep stack past one chip's HBM *without* paying
tensor parallelism's per-sublayer activation collectives: stage s holds
``depth/S`` consecutive DiT blocks, microbatches flow stage-to-stage over
ICI via ``lax.ppermute``, and the backward schedule falls out of autodiff
(the transpose of ``ppermute`` is the reverse ``ppermute``, so reverse-mode
through the tick scan IS the GPipe backward pass).

Design (TPU-first, not a translation):

- Only the homogeneous **block stack** is pipelined — that's where ~95% of
  the FLOPs and parameters live. The stem (patch/code embed, timestep MLP)
  and head (final layer, code head, unpatchify) are tiny; they stay outside
  the ``shard_map`` as plain GSPMD-compiled compute, replicated over
  'pipe'. This mirrors what hand-built pipelines do with embedding/output
  layers on the first/last stage, without the bookkeeping.
- **Partial-manual shard_map**: only the 'pipe' axis is manual. The 'data'
  (and 'fsdp'/'model') axes stay *auto*, so data parallelism inside each
  stage is still GSPMD's job and the pipelined train step composes with
  the existing DP/TP/FSDP shardings unchanged.
- **Stacked parameter layout**: the per-block param subtrees (``block_0`` …
  ``block_{D-1}``) are homogeneous, so the pipelined state stores them as
  one subtree ``blocks`` whose leaves carry a leading ``[depth]`` dim,
  sharded ``P('pipe')``. Each stage's local shard is scanned layer-by-layer
  (``lax.scan`` over the local ``[depth/S, ...]`` leaves). Optimizer
  moments and EMA inherit the same layout and sharding, so per-chip
  optimizer/param memory for the blocks scales 1/S.
- **Checkpoints stay in the plain layout** (``stack_block_params`` /
  ``unstack_block_params`` convert at save/restore), so pipelined and
  non-pipelined runs produce interchangeable checkpoints.

Schedule: M microbatches, S stages, T = M+S-1 ticks; at tick τ stage s
computes microbatch m = τ-s (clamped recompute outside [0, M) — the
redundant passes keep shapes static and their outputs are masked before
the result write, so they contribute zero gradient). Bubble fraction is
(S-1)/T, amortized by raising ``n_micro``.

Validated end-to-end on the virtual 8-device CPU mesh: forward parity with
the plain model at fp32, loss/gradient parity of the pipelined train step
vs the monolithic one, and HLO containing the expected collective-permute
(tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# --------------------------------------------------------------------------
# Parameter layout: plain (block_0 .. block_{D-1}) <-> stacked ('blocks')
# --------------------------------------------------------------------------


def stack_block_params(params: Any) -> Any:
    """Plain DiT param tree -> pipelined layout.

    ``{'params': {'block_0': .., 'block_11': .., <stem/head>}}`` becomes
    ``{'params': {'blocks': <leaves [depth, ...]>, <stem/head>}}``.
    """
    p = dict(params["params"])
    idx = sorted(
        (int(k.split("_")[1]) for k in p if k.startswith("block_")))
    blocks = [p.pop(f"block_{i}") for i in idx]
    p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {**params, "params": p}


def unstack_block_params(params: Any) -> Any:
    """Pipelined layout -> plain DiT param tree (inverse of stack)."""
    p = dict(params["params"])
    blocks = p.pop("blocks")
    depth = jax.tree.leaves(blocks)[0].shape[0]
    for i in range(depth):
        p[f"block_{i}"] = jax.tree.map(lambda x: x[i], blocks)
    return {**params, "params": p}


def is_pipelined(params: Any) -> bool:
    return "blocks" in params.get("params", params)


def convert_state(state: Any, fn: Callable) -> Any:
    """Apply a params-layout converter (stack/unstack) to every
    ``{'params': ...}``-rooted subtree of a TrainState — params, EMA and
    the adam mu/nu moments all share that root, so one tree-walk converts
    the whole state between the plain and pipelined layouts (this is what
    keeps checkpoints from pipelined and non-pipelined runs
    interchangeable)."""
    def is_p(x):
        return isinstance(x, dict) and "params" in x

    return jax.tree.map(lambda x: fn(x) if is_p(x) else x, state,
                        is_leaf=is_p)


# --------------------------------------------------------------------------
# Shardings for the stacked layout
# --------------------------------------------------------------------------


def pipeline_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedShardings for the pipelined layout.

    Leaves under ``blocks`` shard their leading [depth] dim over 'pipe';
    the remaining dims reuse the TP/FSDP rules from
    :func:`..parallel.sharding.param_shardings` (shifted one dim right).
    Stem/head leaves replicate over 'pipe' and keep their usual specs.
    """
    from .sharding import _spec_for, _with_fsdp

    fsdp = mesh.shape["fsdp"] if "fsdp" in mesh.axis_names else 1
    ep = "ep" in mesh.axis_names

    def spec(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if "blocks" in names:
            inner = _spec_for(tuple(path), leaf.ndim - 1, ep=ep)
            inner = _with_fsdp(inner, leaf.shape[1:], fsdp)
            return P(*(("pipe",) + tuple(inner)))
        return _with_fsdp(_spec_for(tuple(path), leaf.ndim, ep=ep),
                          leaf.shape, fsdp)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec(path, leaf)), params)


def pipeline_state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for a whole TrainState in the pipelined layout — params,
    EMA and adam moments all carry the same stacked subtree paths, so the
    same rule applies uniformly (scalars match nothing and replicate)."""
    return pipeline_param_shardings(state, mesh)


# --------------------------------------------------------------------------
# The pipelined forward
# --------------------------------------------------------------------------


def _block_apply(cfg) -> Callable:
    from ..models.dit import DiTBlock

    block = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                     dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     attn_impl=cfg.attn_impl, quant=cfg.quant)
    return lambda p, x, c: block.apply({"params": p}, x, c)


def _stem(p: Any, x: jnp.ndarray, t: jnp.ndarray, code: jnp.ndarray, cfg,
          x_is_tokens: bool = False):
    """Token + conditioning embeddings — mirrors DiT.__call__ (dit.py:315-340,
    reference models.py:243-258); parity pinned by tests/test_pipeline.py."""
    from ..models.dit import TimestepEmbedder, embed_condition

    dt = cfg.dtype
    h = x.astype(dt) if x_is_tokens else embed_condition({"params": p}, x, cfg)
    code_kernel = p["code_in"]["kernel"].astype(dt)
    code_bias = p["code_in"]["bias"].astype(dt)
    h = h + code.astype(dt) @ code_kernel + code_bias
    c = TimestepEmbedder(cfg.hidden_size, dtype=dt,
                         param_dtype=cfg.param_dtype).apply(
        {"params": p["t_embedder"]}, t)
    return h, c


def _head(p: Any, h: jnp.ndarray, c: jnp.ndarray, cfg):
    """Final layer + dual heads + unpatchify — mirrors dit.py:348-364."""
    import flax.linen as nn

    from ..models.dit import FinalLayer

    dt = cfg.dtype
    x = FinalLayer(cfg.hidden_size, cfg.patch_dim, dtype=dt,
                   param_dtype=cfg.param_dtype).apply(
        {"params": p["final_layer"]}, h, c)
    h1 = x @ p["code_out1"]["kernel"].astype(dt) + p["code_out1"]["bias"].astype(dt)
    code_out = (nn.silu(h1) @ p["code_out2"]["kernel"].astype(dt)
                + p["code_out2"]["bias"].astype(dt))
    b = x.shape[0]
    n_side, pp = cfg.tokens_per_side, cfg.patch_size
    img = x.reshape(b, n_side, n_side, pp, pp, cfg.out_channels)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, cfg.input_size, cfg.input_size, cfg.out_channels)
    return img.astype(jnp.float32), code_out.astype(jnp.float32)


def make_pipeline_apply(cfg, mesh: Mesh, n_micro: int | None = None) -> Callable:
    """Build ``apply_fn(pp_params, x, t, code)`` — a drop-in for
    ``model.apply`` whose block stack runs the GPipe schedule over the
    mesh's 'pipe' axis.

    n_micro: number of microbatches (default: 2×stages — bubble ≤ 1/3 of
    ticks even at the default). The global batch must divide by it AND by
    the data-axis size per microbatch.
    """
    if "pipe" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'pipe' axis")
    n_stages = mesh.shape["pipe"]
    n_micro = n_micro or 2 * n_stages
    if cfg.depth % n_stages:
        raise ValueError(
            f"depth {cfg.depth} not divisible by pipe={n_stages}")
    block_apply = _block_apply(cfg)

    def pipe_body(blocks_local, h_all, c_all):
        # blocks_local: leaves [depth/S, ...] (this stage's blocks);
        # h_all [M, mb, N, H], c_all [M, mb, H] replicated over 'pipe'.
        s = lax.axis_index("pipe")
        m_total = h_all.shape[0]
        ticks = m_total + n_stages - 1

        def stage(h, c):
            def one(hh, blk):
                return block_apply(blk, hh, c), None
            return lax.scan(one, h, blocks_local)[0]

        def tick(carry, tau):
            h, out = carry
            m_in = jnp.clip(tau, 0, m_total - 1)
            m_s = jnp.clip(tau - s, 0, m_total - 1)
            h = jnp.where(s == 0,
                          lax.dynamic_index_in_dim(h_all, m_in, 0, False), h)
            c = lax.dynamic_index_in_dim(c_all, m_s, 0, False)
            h = stage(h, c)
            valid = (s == n_stages - 1) & (tau - s >= 0) & (tau - s < m_total)
            cur = lax.dynamic_index_in_dim(out, m_s, 0, False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, h, cur), m_s, 0)
            h = lax.ppermute(h, "pipe",
                             [(i, (i + 1) % n_stages)
                              for i in range(n_stages)])
            return (h, out), None

        h0 = lax.pcast(jnp.zeros_like(h_all[0]), ("pipe",), to="varying")
        out0 = lax.pcast(jnp.zeros_like(h_all), ("pipe",), to="varying")
        (_, out), _ = lax.scan(tick, (h0, out0), jnp.arange(ticks))
        # Only the last stage ever writes; psum makes the result genuinely
        # replicated over 'pipe' so it can leave the manual region.
        return lax.psum(
            jnp.where(s == n_stages - 1, out, jnp.zeros_like(out)), "pipe")

    pipe_blocks = jax.shard_map(
        pipe_body, mesh=mesh,
        in_specs=(P("pipe"), P(), P()),
        out_specs=P(), axis_names={"pipe"})

    def apply_fn(pp_params, x, t, code, x_is_tokens: bool = False):
        p = pp_params["params"]
        stem_p = {k: v for k, v in p.items() if k != "blocks"}
        h, c = _stem(stem_p, x, t, code, cfg, x_is_tokens=x_is_tokens)
        b = h.shape[0]
        if b % n_micro:
            raise ValueError(
                f"batch {b} not divisible by n_micro={n_micro}")
        mb = b // n_micro

        from .mesh import batch_axes

        axes = batch_axes(mesh)
        lead = axes[0] if len(axes) == 1 else axes

        def to_micro(a):
            a = a.reshape(n_micro, mb, *a.shape[1:])
            spec = P(*((None, lead) + (None,) * (a.ndim - 2)))
            return lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        h_out = pipe_blocks(p["blocks"], to_micro(h), to_micro(c))
        h_out = h_out.reshape(b, *h_out.shape[2:])
        c_full = c  # head consumes the un-microbatched conditioning
        return _head(stem_p, h_out.astype(cfg.dtype), c_full, cfg)

    return apply_fn
