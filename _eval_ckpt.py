import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.eval.solver import PuzzleSolver
from jpdvt_mt_ntnu_tpu.train import CheckpointManager, create_train_state
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles

model, cfg = create_model("JPDVT", input_size=192, depth=6, hidden_size=384, num_heads=6, attn_impl="xla")
mgr = CheckpointManager("/tmp/demo_train6/000-synthetic-JPDVT/checkpoints")
print("latest ckpt step:", mgr.latest_step())
state = mgr.restore(create_train_state(model, cfg, jax.random.key(0), make_optimizer()))
ds = SyntheticPuzzles(192, n=16, seed=7)
x = jnp.asarray(np.stack([ds[i] for i in range(16)]))
for mode, steps in [("fast","250"), ("iterative","50")]:
    solver = PuzzleSolver(model, cfg, create_diffusion(steps), grid_size=3, mode=mode)
    for tag, params in [("params", state.params), ("ema", state.ema_params)]:
        res = solver.evaluate(params, x, jax.random.key(1))
        print(f"{mode}/{tag}: puzzle={res.puzzle_accuracy:.2f} patch={res.patch_accuracy:.3f}")
