"""Pipeline parallelism (parallel/pipeline.py) — GPipe over the 'pipe' axis.

Proven on the virtual 8-device CPU mesh:

- the pipelined forward is numerically the plain ``model.apply`` (the
  schedule, layout stacking and stem/head split must never change the
  math);
- the PRODUCTION train step with pipe=2 and pipe=4 produces the same
  losses step-for-step as pure DP;
- the state that comes out of the step keeps the stacked-blocks layout
  sharded over 'pipe' (params, EMA, adam moments);
- the compiled step actually contains collective-permute (the stage
  handoff — without it the "pipeline" would be replicated compute);
- checkpoints are layout-interchangeable: a pipelined run resumes from a
  plain run's checkpoint and vice versa, through the production CLI.

Reference point: the reference has no pipeline story — DDP only
(image_model/train_JPDVT.py:231).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Long-running parity suite: excluded from the fast tier (pytest -m 'not slow');
# the FULL suite remains the round gate (README quick start shows both).
pytestmark = pytest.mark.slow

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.parallel import (MeshSpec, convert_state, make_mesh,
                                        make_pipeline_apply,
                                        pipeline_state_shardings, shard_batch,
                                        stack_block_params, state_shardings,
                                        unstack_block_params)
from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code


def _model(depth=2):
    return create_model("JPDVT", input_size=48, depth=depth, hidden_size=64,
                        num_heads=4, attn_impl="xla")


def test_stack_unstack_roundtrip():
    model, cfg = _model(depth=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 9, 8)))
    pp = stack_block_params(params)
    assert "blocks" in pp["params"] and "block_0" not in pp["params"]
    qkv = pp["params"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.shape[0] == 2  # leading depth dim
    back = unstack_block_params(pp)
    jax.tree.map(np.testing.assert_array_equal, params, back)


@pytest.mark.parametrize("pipe,data,n_micro", [(2, 4, 2), (4, 2, 4)])
def test_pipelined_forward_matches_plain_apply(pipe, data, n_micro):
    depth = 4
    model, cfg = _model(depth=depth)
    mesh = make_mesh(MeshSpec(data=data, pipe=pipe))
    params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 9, 8)))
    x = jax.random.normal(jax.random.key(1), (16, 48, 48, 3)) * 0.5
    t = jax.random.randint(jax.random.key(2), (16,), 0, 1000)
    code = jax.random.normal(jax.random.key(3), (16, 9, 8))

    ref_img, ref_code = model.apply(params, x, t, code)
    apply_fn = make_pipeline_apply(cfg, mesh, n_micro)
    pp_img, pp_code = jax.jit(apply_fn)(stack_block_params(params), x, t, code)
    np.testing.assert_allclose(np.asarray(pp_img), np.asarray(ref_img),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pp_code), np.asarray(ref_code),
                               atol=2e-5)


def _run(mesh, pipelined, n_steps=3, depth=4):
    model, cfg = _model(depth=depth)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    if pipelined:
        apply_fn = make_pipeline_apply(cfg, mesh, 2)
        state = convert_state(state, stack_block_params)
        state = jax.device_put(state, pipeline_state_shardings(state, mesh))
    else:
        apply_fn = None
        state = jax.device_put(state, state_shardings(state, mesh))
    step = make_train_step(model, create_diffusion(""), opt,
                           TrainTask(grid_size=3, block_size=16, patch_size=16),
                           jnp.asarray(grid_code(8, 3)), donate=False,
                           apply_fn=apply_fn)
    losses = []
    for i in range(n_steps):
        x = jax.random.normal(jax.random.key(100 + i), (16, 48, 48, 3)) * 0.5
        batch = shard_batch({"x": x}, mesh)["x"]
        state, m = step(state, batch, jax.random.key(1))
        losses.append(float(m["loss"]))
    return state, losses


@pytest.mark.parametrize("pipe,data", [(2, 4), (4, 2)])
def test_pp_losses_match_dp_step_for_step(pipe, data):
    """pipe=2/4 training == pure DP, same global batch, fp32. The pipeline
    schedule must be a pure re-layout of the same math."""
    _, dp_losses = _run(make_mesh(MeshSpec(data=8)), pipelined=False)
    _, pp_losses = _run(make_mesh(MeshSpec(data=data, pipe=pipe)),
                        pipelined=True)
    np.testing.assert_allclose(pp_losses, dp_losses, rtol=2e-5)


def test_pp_state_stays_sharded_through_the_step():
    mesh = make_mesh(MeshSpec(data=4, pipe=2))
    state, _ = _run(mesh, pipelined=True, n_steps=1)

    def qkv_kernel(tree):
        return tree["params"]["blocks"]["attn"]["qkv"]["kernel"]

    for leaf in (qkv_kernel(state.params), qkv_kernel(state.ema_params),
                 qkv_kernel(state.opt_state[0].mu),
                 qkv_kernel(state.opt_state[0].nu)):
        assert "pipe" in str(leaf.sharding.spec), leaf.sharding
        # Each stage holds depth/2 of the 4 stacked blocks.
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[0] == leaf.shape[0] // 2
    assert state.step.sharding.is_fully_replicated


def test_pp_step_hlo_contains_collective_permute():
    """The stage handoff must be IN the compiled program — a silent GSPMD
    fallback to replicated compute would pass every numeric test."""
    mesh = make_mesh(MeshSpec(data=4, pipe=2))
    model, cfg = _model(depth=4)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    state = convert_state(state, stack_block_params)
    state = jax.device_put(state, pipeline_state_shardings(state, mesh))
    step = make_train_step(model, create_diffusion(""), opt,
                           TrainTask(grid_size=3, block_size=16, patch_size=16),
                           jnp.asarray(grid_code(8, 3)), donate=False,
                           apply_fn=make_pipeline_apply(cfg, mesh, 2))
    x = shard_batch({"x": jnp.zeros((16, 48, 48, 3))}, mesh)["x"]
    hlo = step.lower(state, x, jax.random.key(1)).compile().as_text()
    assert re.search(r"\bcollective-permute\b", hlo), \
        "no collective-permute in the compiled pipelined step"


def test_run_train_cli_with_pipe_axis(tmp_path, monkeypatch):
    """The production CLI trains, validates and checkpoints with
    mesh.pipe=2, and the checkpoint is layout-interchangeable: the plain
    (pipe=1) trainer resumes from it, and the pipelined trainer resumes
    from the plain one's save."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    common = [
        "data.dataset=synthetic", "data.global_batch_size=16",
        "data.num_workers=2", "data.synthetic_n=16",
        "model.image_size=48", "model.depth=2", "model.hidden_size=64",
        "model.num_heads=4", "model.compute_dtype=float32",
        "task.grid_size=3",
        "train.log_every=1", "train.ckpt_every=1000000",
        f"train.exp_dir={tmp_path}/exp",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
    ]
    assert main(common + ["mesh.data=4", "mesh.pipe=2",
                          "train.epochs=1"]) == 0
    # plain trainer resumes the pipelined checkpoint
    assert main(common + ["mesh.data=8", "train.epochs=1",
                          f"train.resume={tmp_path}/exp/checkpoints"]) == 0
    # pipelined trainer resumes the plain save
    assert main(common + ["mesh.data=4", "mesh.pipe=2", "train.epochs=1",
                          f"train.resume={tmp_path}/exp/checkpoints"]) == 0
