"""Fully-sharded data parallelism (ZeRO-3) on the virtual 8-device mesh.

The reference replicates the full model + optimizer on every rank (plain
DDP, image_model/train_JPDVT.py:231). This framework adds an optional
'fsdp' mesh axis (parallel/mesh.py): the batch shards over data x fsdp
combined, and params/EMA/adam moments ADDITIONALLY shard their largest
divisible dim over 'fsdp' (parallel/sharding._with_fsdp) — per-chip state
memory scales 1/fsdp while GSPMD inserts the per-layer weight all-gathers
and gradient reduce-scatters. These tests prove on the virtual mesh that

- the math is unchanged: fsdp=4 training == pure-DP training
  step-for-step (both optimizer paths), and dp x fsdp x tp all at once
  still matches;
- the state really is sharded 1/fsdp per device, stays so through the
  jitted step, and scalars replicate;
- the compiled HLO contains the ZeRO signature (weight all-gathers and
  strictly more cross-device traffic than pure DP);
- the production CLI trains, checkpoints and resumes with mesh.fsdp=2;
- meshes without the axis are untouched (shape dicts and batch specs are
  bit-identical to earlier rounds).
"""

import jax
import numpy as np
import pytest

# Long-running parity suite: excluded from the fast tier (pytest -m 'not slow');
# the FULL suite remains the round gate (README quick start shows both).
pytestmark = pytest.mark.slow
from jax.sharding import PartitionSpec as P

from jpdvt_mt_ntnu_tpu.parallel import (MeshSpec, batch_sharding, make_mesh,
                                        param_shardings)
from jpdvt_mt_ntnu_tpu.parallel.mesh import batch_axes, local_batch_size
from test_tp_train import _run


def test_mesh_gains_fsdp_axis_only_when_requested():
    mesh = make_mesh(MeshSpec(data=-1, model=1, fsdp=4))
    assert mesh.shape == {"data": 2, "fsdp": 4, "model": 1}
    assert batch_axes(mesh) == ("data", "fsdp")
    assert local_batch_size(64, mesh) == 8
    # fsdp=1 keeps the historical 2-axis mesh (HLO/spec-identical).
    mesh2 = make_mesh(MeshSpec(data=-1, model=2))
    assert mesh2.shape == {"data": 4, "model": 2}
    assert batch_axes(mesh2) == ("data",)
    assert batch_sharding(mesh2, 2).spec == P("data", None)


def test_fsdp_param_sharding_rules():
    from jpdvt_mt_ntnu_tpu.models import create_model
    import jax.numpy as jnp

    model, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=64,
                              num_heads=4, attn_impl="xla")
    params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)),
                        jnp.array([0]), jnp.zeros((1, 9, 8)))
    mesh = make_mesh(MeshSpec(data=1, model=2, fsdp=4))
    sh = param_shardings(params, mesh)
    blk = sh["params"]["block_0"]
    # TP dim keeps 'model'; the remaining (and here larger-or-equal) free
    # dim picks up 'fsdp'.
    assert blk["attn"]["qkv"]["kernel"].spec == P("fsdp", "model")
    assert blk["attn"]["proj"]["kernel"].spec == P("model", "fsdp")
    assert blk["mlp"]["fc1"]["kernel"].spec == P("fsdp", "model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P("model", "fsdp")
    # Non-TP matrices shard their largest divisible dim; 1-D leaves and
    # non-divisible dims replicate (correctness never needs divisibility).
    xk = sh["params"]["x_embedder"]["kernel"]
    assert "fsdp" in str(xk.spec)
    assert sh["params"]["block_0"]["attn"]["qkv"]["bias"].spec == P("model")


@pytest.mark.parametrize("fused", [False, True], ids=["optax", "fused_adamw"])
def test_fsdp_losses_match_dp_step_for_step(fused):
    """mesh.fsdp=4 == pure DP, same global batch, fp32, both optimizers."""
    _, dp_losses = _run(make_mesh(MeshSpec(data=8, model=1)), fused=fused)
    _, fsdp_losses = _run(make_mesh(MeshSpec(data=2, model=1, fsdp=4)),
                          fused=fused)
    np.testing.assert_allclose(fsdp_losses, dp_losses, rtol=2e-5)


def test_dp_fsdp_tp_composed_matches_dp():
    """All three axes at once (data=2, fsdp=2, model=2) — same math."""
    _, dp_losses = _run(make_mesh(MeshSpec(data=8, model=1)), fused=True)
    _, mixed_losses = _run(make_mesh(MeshSpec(data=2, model=2, fsdp=2)),
                           fused=True)
    np.testing.assert_allclose(mixed_losses, dp_losses, rtol=2e-5)


def test_fsdp_state_stays_sharded_through_the_step():
    """Params, EMA and adam moments hold 1/fsdp per device after a step."""
    mesh = make_mesh(MeshSpec(data=2, model=1, fsdp=4))
    state, _ = _run(mesh, n_steps=1, fused=True)

    def qkv_kernel(tree):
        return tree["params"]["block_0"]["attn"]["qkv"]["kernel"]

    for leaf in (qkv_kernel(state.params), qkv_kernel(state.ema_params),
                 qkv_kernel(state.opt_state[0].mu),
                 qkv_kernel(state.opt_state[0].nu)):
        assert "fsdp" in str(leaf.sharding.spec), leaf.sharding
        shard = leaf.addressable_shards[0]
        # qkv kernel (64, 192): dim1 is reserved for 'model' (size 1 here),
        # so 'fsdp' shards dim0 four ways — 1/4 of the leaf per device.
        assert shard.data.size == leaf.size // 4, (shard.data.shape, leaf.shape)
    assert state.step.sharding.is_fully_replicated


def test_fsdp_hlo_has_weight_allgathers():
    """The ZeRO signature at the HLO level: the fsdp step needs weight
    all-gathers (and strictly more collectives than pure DP)."""
    from test_hlo_collectives import _compiled_step_hlo, _counts

    dp = _counts(_compiled_step_hlo(make_mesh(MeshSpec(data=8, model=1))))
    fs = _counts(_compiled_step_hlo(make_mesh(MeshSpec(data=2, model=1,
                                                       fsdp=4))))
    assert fs.get("all-gather", 0) >= 1, fs
    assert sum(fs.values()) > sum(dp.values()), (dp, fs)


def test_run_train_cli_with_fsdp_axis(tmp_path, monkeypatch):
    """The production CLI trains + checkpoints + resumes with mesh.fsdp=2."""
    monkeypatch.chdir(tmp_path)
    from jpdvt_mt_ntnu_tpu.train.run_train import main

    common = [
        "data.dataset=synthetic", "data.global_batch_size=8",
        "data.num_workers=2", "data.synthetic_n=16",
        "model.image_size=48", "model.depth=1", "model.hidden_size=64",
        "model.num_heads=4", "model.compute_dtype=float32",
        "task.grid_size=3", "mesh.data=2", "mesh.fsdp=2", "mesh.model=2",
        "train.log_every=2", "train.ckpt_every=1000000",
        f"train.exp_dir={tmp_path}/exp",
        "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
    ]
    assert main(common + ["train.epochs=1"]) == 0
    assert main(common + ["train.epochs=1",
                          f"train.resume={tmp_path}/exp/checkpoints"]) == 0
