"""Collectives in the COMPILED train step — the DDP/NCCL replacement, proven
at the HLO level.

The reference's cross-device story is explicit NCCL calls (gradient
allreduce inside DDP's backward, reference: image_model/train_JPDVT.py:231,
explicit loss all_reduce :386). Here those collectives are inserted by XLA
from sharding annotations (SURVEY.md §2.2); these tests pin that they are
actually THERE in the compiled program — a silent fall-back to replicated
execution (every device computing the full batch) would produce identical
losses and pass every numeric test, while wasting the whole mesh.

Checked on the virtual 8-device CPU mesh:
- pure DP: the compiled step contains an all-reduce (grad reduction over
  'data') and no other cross-device traffic is required;
- DP x TP: the compiled step ALSO moves activations over the 'model' axis
  (Megatron row/col-parallel blocks emit all-reduce / all-gather /
  reduce-scatter — GSPMD is free to pick the decomposition, so we assert
  the family, not one op);
- a single-device mesh compiles with NO collectives (nothing to talk to).
"""

import re

import jax
import jax.numpy as jnp
import pytest

# Long-running parity suite: excluded from the fast tier (pytest -m 'not slow');
# the FULL suite remains the round gate (README quick start shows both).
pytestmark = pytest.mark.slow

from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.parallel import (MeshSpec, batch_sharding, make_mesh,
                                        shard_batch, state_shardings)
from jpdvt_mt_ntnu_tpu.train import create_train_state, make_train_step
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.train.steps import TrainTask
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code

COLLECTIVE = re.compile(r"\b(all-reduce|all-gather|reduce-scatter|"
                        r"collective-permute|all-to-all)\b")


def _compiled_step_hlo(mesh):
    model, cfg = create_model("JPDVT", input_size=48, depth=2, hidden_size=64,
                              num_heads=4, attn_impl="xla")
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, cfg, jax.random.key(0), opt)
    state = jax.device_put(state, state_shardings(state, mesh))
    step = make_train_step(model, create_diffusion(""), opt,
                           TrainTask(grid_size=3, block_size=16, patch_size=16),
                           jnp.asarray(grid_code(8, 3)), donate=False)
    x = shard_batch({"x": jnp.zeros((8, 48, 48, 3))}, mesh)["x"]
    return step.lower(state, x, jax.random.key(1)).compile().as_text()


def _counts(hlo: str) -> dict:
    out: dict = {}
    for m in COLLECTIVE.finditer(hlo):
        out[m.group(1)] = out.get(m.group(1), 0) + 1
    return out


def test_single_device_mesh_has_no_collectives():
    hlo = _compiled_step_hlo(make_mesh(MeshSpec(data=1, model=1),
                                       devices=jax.devices()[:1]))
    assert not _counts(hlo), _counts(hlo)


def test_dp_step_reduces_gradients():
    hlo = _compiled_step_hlo(make_mesh(MeshSpec(data=8, model=1)))
    counts = _counts(hlo)
    # gradient reduction over the data axis must exist (DDP's allreduce)
    assert counts.get("all-reduce", 0) >= 1, counts


def test_dp_tp_step_moves_activations_over_model_axis():
    dp = _counts(_compiled_step_hlo(make_mesh(MeshSpec(data=8, model=1))))
    tp = _counts(_compiled_step_hlo(make_mesh(MeshSpec(data=4, model=2))))
    # TP adds activation collectives on top of DP's gradient reduction:
    # strictly more cross-device ops, and at least one gather/scatter/reduce
    # family member beyond what pure DP needed.
    assert sum(tp.values()) > sum(dp.values()), (dp, tp)
    assert any(tp.get(k, 0) > dp.get(k, 0)
               for k in ("all-reduce", "all-gather", "reduce-scatter",
                         "all-to-all")), (dp, tp)
