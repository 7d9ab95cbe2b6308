import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.core.diffusion import create_diffusion
from jpdvt_mt_ntnu_tpu.train import CheckpointManager, create_train_state
from jpdvt_mt_ntnu_tpu.train.state import make_optimizer
from jpdvt_mt_ntnu_tpu.utils.pos_embed import grid_code
from jpdvt_mt_ntnu_tpu.data import SyntheticPuzzles

model, cfg = create_model("JPDVT", input_size=192, depth=6, hidden_size=384, num_heads=6, attn_impl="xla")
mgr = CheckpointManager("/tmp/demo_train6/000-synthetic-JPDVT/checkpoints")
state = mgr.restore(create_train_state(model, cfg, jax.random.key(0), make_optimizer()))
d = create_diffusion("")
code = jnp.asarray(grid_code(8,3))
ds = SyntheticPuzzles(192, n=8, seed=0)   # TRAIN distribution seeds
x = jnp.asarray(np.stack([ds[i] for i in range(8)]))

def model_fn(xi, t, c):
    return model.apply(state.params, xi, t, c)

for tval in [0, 100, 500, 900, 999]:
    t = jnp.full((8,), tval, jnp.int32)
    out = d.training_losses(model_fn, x, t, code, jax.random.key(5),
                            block_size=64, patch_size=16, grid_size=3, shared_perm=False)
    print(f"t={tval}: code_mse={float(out['code_mse'].mean()):.4f}")
# baseline: zero-prediction loss at t=999 = E[code^2]
tok = code  # (9,8)
print("E[code^2] =", float((tok**2).mean()))
