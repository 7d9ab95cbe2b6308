"""Mesh + sharding on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from jpdvt_mt_ntnu_tpu.models import create_model
from jpdvt_mt_ntnu_tpu.parallel import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)
from jpdvt_mt_ntnu_tpu.parallel.mesh import local_batch_size, process_shard


def test_eight_devices():
    assert jax.device_count() == 8


def test_mesh_shapes():
    mesh = make_mesh(MeshSpec(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


def test_local_batch_and_process_shard():
    mesh = make_mesh()
    assert local_batch_size(96, mesh) == 12
    items = list(range(10))
    shards = [process_shard(items, i, 4) for i in range(4)]
    assert sorted(sum(shards, [])) == items
    assert shards[1] == [1, 5, 9]


def test_data_parallel_psum_matches_single_device():
    """A sharded global-batch mean-loss grad == the unsharded one."""
    mesh = make_mesh(MeshSpec(model=1))
    w = jnp.ones((4,))
    x = jax.random.normal(jax.random.key(0), (16, 4))

    def loss(w, x):
        return ((x @ w) ** 2).mean()

    g_ref = jax.grad(loss)(w, x)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               rtol=1e-6)


def test_tp_param_shardings_rules():
    model, cfg = create_model("JPDVT", input_size=48, depth=1, hidden_size=64,
                              num_heads=4, attn_impl="xla")
    params = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)),
                        jnp.array([0]), jnp.zeros((1, 9, 8)))
    mesh = make_mesh(MeshSpec(data=4, model=2))
    sh = param_shardings(params, mesh)
    p = sh["params"]["block_0"]
    assert p["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert p["attn"]["proj"]["kernel"].spec == P("model", None)
    assert p["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert p["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert sh["params"]["x_embedder"]["kernel"].spec == P()


def test_tp_forward_matches_replicated():
    """DiT forward under (data=4, model=2) sharding == single-device result."""
    model, cfg = create_model("JPDVT", input_size=48, depth=2, hidden_size=64,
                              num_heads=4, attn_impl="xla")
    x = jax.random.normal(jax.random.key(1), (8, 48, 48, 3))
    code = jax.random.normal(jax.random.key(2), (8, 9, 8))
    t = jnp.arange(8)
    params = model.init(jax.random.key(0), x, t, code)
    img_ref, code_ref = model.apply(params, x, t, code)

    mesh = make_mesh(MeshSpec(data=4, model=2))
    params_sh = jax.device_put(params, param_shardings(params, mesh))
    batch = shard_batch({"x": x, "t": t, "code": code}, mesh)
    img, c = jax.jit(model.apply)(params_sh, batch["x"], batch["t"], batch["code"])
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(code_ref),
                               rtol=2e-4, atol=2e-5)
