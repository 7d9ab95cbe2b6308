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
