"""Serving layer: service contract + stdlib transport routes."""

import base64
import io
import json

import numpy as np
import pytest
from PIL import Image

from jpdvt_mt_ntnu_tpu.serve.app import _Handler, _parse_multipart
from jpdvt_mt_ntnu_tpu.serve.service import PuzzleService, ServiceConfig


@pytest.fixture(scope="module")
def service():
    return PuzzleService(ServiceConfig(
        image_size=48, depth=1, hidden_size=32, num_heads=2,
        sampling_steps=3, sampler_mode="fast", compute_dtype="float32"))


def _png_bytes(size=64):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_models_endpoint(service):
    models = service.models()
    assert models[0]["id"] == "default"
    assert "name" in models[0] and "description" in models[0]


def test_create_puzzle_contract(service):
    out = service.create_puzzle(_png_bytes(), seed=7)
    assert set(out) == {"original_image", "puzzle_image", "indices",
                        "initial_metrics"}
    assert sorted(out["indices"]) == list(range(9))
    m = out["initial_metrics"]
    assert m["total_patches"] == 9
    # returned images decode as PNGs of the configured size
    img = Image.open(io.BytesIO(base64.b64decode(out["puzzle_image"])))
    assert img.size == (48, 48)
    # seeded: same seed -> same permutation
    out2 = service.create_puzzle(_png_bytes(), seed=7)
    assert out2["indices"] == out["indices"]


def test_solve_puzzle_contract(service):
    out = service.solve_puzzle(_png_bytes())
    assert out["success"] is True
    for key in ("original_image", "scrambled_image", "solution_image"):
        Image.open(io.BytesIO(base64.b64decode(out[key])))
    assert set(out["metrics"]) == {"puzzle_correct", "patch_matches",
                                   "total_patches", "patch_accuracy"}
    assert sorted(out["details"]["predicted_order"]) == list(range(9))


def test_solve_contract_roundtrip(service):
    created = service.create_puzzle(_png_bytes(), seed=3)
    out = service.solve(created["puzzle_image"], created["indices"])
    assert out["success"] is True
    assert out["image_info"]["grid_size"] == "3x3"
    assert out["image_info"]["image_resolution"] == "48x48"
    assert isinstance(out["processing_time"], float)
    assert sorted(out["predicted_order"]) == list(range(9))


def test_stdlib_routes(service):
    h = _Handler(service)
    status, ctype, body = h.handle("GET", "/api/models", {}, b"")
    assert status == 200 and json.loads(body)[0]["id"] == "default"

    # JSON solve route
    created = service.create_puzzle(_png_bytes(), seed=1)
    payload = json.dumps({"image_data": created["puzzle_image"],
                          "indices": created["indices"]}).encode()
    status, _, body = h.handle("POST", "/api/solve", {}, payload)
    assert status == 200 and json.loads(body)["success"] is True

    # multipart create_puzzle route
    boundary = "XBOUND"
    png = _png_bytes()
    mp = (f"--{boundary}\r\n"
          'Content-Disposition: form-data; name="file"; filename="a.png"\r\n'
          "Content-Type: image/png\r\n\r\n").encode() + png + \
         (f"\r\n--{boundary}\r\n"
          'Content-Disposition: form-data; name="seed"\r\n\r\n'
          f"5\r\n--{boundary}--\r\n").encode()
    status, _, body = h.handle(
        "POST", "/api/create_puzzle",
        {"content-type": f"multipart/form-data; boundary={boundary}"}, mp)
    assert status == 200
    assert sorted(json.loads(body)["indices"]) == list(range(9))

    # 404 + error paths
    status, _, _ = h.handle("GET", "/api/nope", {}, b"")
    assert status == 404
    status, _, body = h.handle("POST", "/api/solve", {}, b"not json")
    assert status == 500 and b"Error" in body

    # SPA served
    status, ctype, body = h.handle("GET", "/", {}, b"")
    assert status == 200 and b"JPDVT" in body


def test_multipart_parser():
    b = "B0"
    raw = (f"--{b}\r\n"
           'Content-Disposition: form-data; name="x"\r\n\r\n'
           f"hello\r\n--{b}--\r\n").encode()
    fields = _parse_multipart(raw, f"multipart/form-data; boundary={b}")
    assert fields["x"] == b"hello"


# ---------------------------------------------------------------------------
# Plugin registry + micro-batching (reference api/app.py:453-552 FCViT slot)
# ---------------------------------------------------------------------------


def test_plugin_registered_and_served(service):
    from jpdvt_mt_ntnu_tpu.serve import plugins as P

    solver = P.EdgeMatchSolver(grid_size=3)
    P.register_solver(solver)
    try:
        models = service.models()
        assert any(m["id"] == "edgematch" for m in models)
        created = service.create_puzzle(_png_bytes(), seed=11)
        out = service.solve(created["puzzle_image"], created["indices"],
                            model_id="edgematch")
        assert out["success"] is True
        assert sorted(out["predicted_order"]) == list(range(9))
    finally:
        P.unregister_solver("edgematch")
    assert not any(m["id"] == "edgematch" for m in service.models())


def test_plugin_reserved_ids_rejected():
    from jpdvt_mt_ntnu_tpu.serve import plugins as P

    bad = P.EdgeMatchSolver(3)
    bad.info = P.SolverInfo("default", "x", "y")
    with pytest.raises(ValueError):
        P.register_solver(bad)


def test_unknown_model_id_errors(service):
    created = service.create_puzzle(_png_bytes(), seed=2)
    h = _Handler(service)
    payload = json.dumps({"image_data": created["puzzle_image"],
                          "model_id": "no-such-model"}).encode()
    status, _, body = h.handle("POST", "/api/solve", {}, payload)
    assert status == 500 and b"no-such-model" in body


def test_edgematch_solves_smooth_puzzle():
    """On smooth low-frequency images, edge continuity identifies the true
    arrangement — the plugin must actually solve, not just run."""
    import jax
    import jax.numpy as jnp

    from jpdvt_mt_ntnu_tpu.data.datasets import SyntheticPuzzles
    from jpdvt_mt_ntnu_tpu.ops import jigsaw
    from jpdvt_mt_ntnu_tpu.serve.plugins import EdgeMatchSolver

    ds = SyntheticPuzzles(48, n=8, seed=5, position_cues=False)
    x = jnp.asarray(np.stack([ds[i] for i in range(8)]))
    indices = jigsaw.random_permutations(jax.random.key(0), 8, 9)
    scrambled = jigsaw.scramble(x, indices, 3)
    pred = EdgeMatchSolver(3).solve_batch(np.asarray(scrambled))
    patch_acc = (pred == np.asarray(indices)).mean()
    assert patch_acc > 0.8, patch_acc


def test_microbatcher_batches_concurrent_requests():
    import threading

    from jpdvt_mt_ntnu_tpu.serve.plugins import MicroBatcher

    calls = []

    def solve_fn(xs):
        calls.append(xs.shape[0])
        return xs[:, 0, 0, :9].argsort(-1)  # deterministic per-row function

    mb = MicroBatcher(solve_fn, max_batch=4, window_ms=200.0)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(4, 12, 12, 16)).astype(np.float32)
    results = [None] * 4

    def call(i):
        results[i] = mb.solve(imgs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every caller got ITS row's answer
    for i in range(4):
        np.testing.assert_array_equal(results[i],
                                      imgs[i, 0, 0, :9].argsort(-1))
    # requests were coalesced: far fewer programs than requests, all padded
    # to the single compiled shape
    assert all(c == 4 for c in calls)
    assert mb.items_run == 4 and mb.batches_run <= 2
    mb.shutdown()


def test_microbatcher_propagates_errors():
    from jpdvt_mt_ntnu_tpu.serve.plugins import MicroBatcher

    def solve_fn(xs):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(solve_fn, max_batch=2, window_ms=1.0)
    with pytest.raises(RuntimeError, match="device on fire"):
        mb.solve(np.zeros((4, 4, 3), np.float32))
    mb.shutdown()


def test_service_batched_solves_match_unbatched():
    """End-to-end: a batching service returns the same predictions as the
    unbatched one for concurrent requests."""
    import threading

    svc = PuzzleService(ServiceConfig(
        image_size=48, depth=1, hidden_size=32, num_heads=2,
        sampling_steps=2, sampler_mode="fast", compute_dtype="float32",
        batch_window_ms=100.0, batch_max=4))
    ref = PuzzleService(ServiceConfig(
        image_size=48, depth=1, hidden_size=32, num_heads=2,
        sampling_steps=2, sampler_mode="fast", compute_dtype="float32"))
    # identical random init => identical params
    created = [svc.create_puzzle(_png_bytes(48 + s), seed=s)
               for s in range(4)]
    outs = [None] * 4

    def call(i):
        outs[i] = svc.solve(created[i]["puzzle_image"],
                            created[i]["indices"])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        expect = ref.solve(created[i]["puzzle_image"], created[i]["indices"])
        assert outs[i]["predicted_order"] == expect["predicted_order"]
    key = svc.solver.mode
    assert svc._batchers[key].items_run == 4
    assert svc._batchers[key].batches_run <= 2
