"""Serving request gate: API-key auth + rate limiting, both transports'
shared policy (serve/gate.py). The reference has no auth at all
(api/app.py:49-55); the gate must stay OFF by default to keep the
reference contract, and enforce 401/429 when configured."""

import json

import pytest

from jpdvt_mt_ntnu_tpu.serve.app import _Handler
from jpdvt_mt_ntnu_tpu.serve.gate import AccessGate
from jpdvt_mt_ntnu_tpu.serve.service import PuzzleService, ServiceConfig


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


# ------------------------------------------------------------- unit: gate

def test_gate_open_by_default():
    g = AccessGate()
    assert g.check("1.2.3.4", {}).allowed


def test_gate_api_key_required_and_constant_time_paths():
    g = AccessGate(api_key="s3cret")
    assert g.check("c", {}).status == 401
    assert g.check("c", {"x-api-key": "wrong"}).status == 401
    assert g.check("c", {"x-api-key": "s3cret"}).allowed
    assert g.check("c", {"authorization": "Bearer s3cret"}).allowed
    assert g.check("c", {"authorization": "Bearer nope"}).status == 401


def test_gate_token_bucket_refills():
    clock = FakeClock()
    g = AccessGate(rate_limit=1.0, rate_burst=2, clock=clock)
    assert g.check("a", {}).allowed
    assert g.check("a", {}).allowed
    d = g.check("a", {})
    assert d.status == 429 and d.retry_after > 0
    # another client has its own bucket
    assert g.check("b", {}).allowed
    # refill after enough simulated time
    clock.t += 1.5
    assert g.check("a", {}).allowed


def test_gate_x_forwarded_for_identifies_client():
    clock = FakeClock()
    g = AccessGate(rate_limit=1.0, rate_burst=1, clock=clock)
    assert g.check("proxy", {"x-forwarded-for": "9.9.9.9"}).allowed
    # same forwarded client through the same proxy: limited
    assert g.check("proxy", {"x-forwarded-for": "9.9.9.9"}).status == 429
    # different forwarded client: own bucket
    assert g.check("proxy", {"x-forwarded-for": "8.8.8.8"}).allowed


def test_gate_client_table_is_bounded():
    g = AccessGate(rate_limit=100.0, max_clients=10)
    for i in range(25):
        assert g.check(f"c{i}", {}).allowed
    assert len(g._buckets) <= 10


def test_service_config_env_defaults(monkeypatch):
    monkeypatch.setenv("JPDVT_API_KEY", "k")
    monkeypatch.setenv("JPDVT_RATE_LIMIT", "2.5")
    monkeypatch.setenv("JPDVT_RATE_BURST", "7")
    cfg = ServiceConfig()
    assert cfg.api_key == "k"
    assert cfg.rate_limit == 2.5
    assert cfg.rate_burst == 7
    monkeypatch.delenv("JPDVT_API_KEY")
    monkeypatch.delenv("JPDVT_RATE_LIMIT")
    monkeypatch.delenv("JPDVT_RATE_BURST")
    cfg = ServiceConfig()
    assert cfg.api_key == "" and cfg.rate_limit == 0.0


# ----------------------------------------------- integration: stdlib routes

@pytest.fixture(scope="module")
def service():
    return PuzzleService(ServiceConfig(
        image_size=48, depth=1, hidden_size=32, num_heads=2,
        sampling_steps=3, sampler_mode="fast", compute_dtype="float32"))


def test_handler_enforces_gate_on_posts_only(service):
    h = _Handler(service, AccessGate(api_key="k"))
    # GETs stay open
    status, _, body = h.handle("GET", "/api/models", {}, b"")
    assert status == 200
    # POST without key -> 401 before any body parsing
    status, _, body = h.handle("POST", "/api/solve", {}, b"not json",
                               client="1.2.3.4")
    assert status == 401
    assert "API key" in json.loads(body)["detail"]


def test_handler_allows_keyed_solve(service):
    h = _Handler(service, AccessGate(api_key="k"))
    created = service.create_puzzle(_png(), seed=1)
    payload = json.dumps({"image_data": created["puzzle_image"],
                          "indices": created["indices"]}).encode()
    status, _, body = h.handle("POST", "/api/solve", {"x-api-key": "k"},
                               payload, client="1.2.3.4")
    assert status == 200 and json.loads(body)["success"] is True


def test_handler_rate_limits(service):
    clock = FakeClock()
    h = _Handler(service, AccessGate(rate_limit=1.0, rate_burst=1,
                                     clock=clock))
    created = service.create_puzzle(_png(), seed=2)
    payload = json.dumps({"image_data": created["puzzle_image"],
                          "indices": created["indices"]}).encode()
    assert h.handle("POST", "/api/solve", {}, payload, client="c")[0] == 200
    status, _, body = h.handle("POST", "/api/solve", {}, payload, client="c")
    assert status == 429
    assert json.loads(body)["retry_after"] > 0


def _png(size=64):
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                       dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()
