"""HTTP extraction backend — hermetic lifecycle tests (mirrors the
reference's mocked server-lifecycle suite,
webapp/llm_processing/tests/test_server_lifecycle.py: health gating,
failure classification, request shape)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from llmaix_spark.operators.extraction import ExtractionConfig, HttpBackend


class _FakeLlamaServer(BaseHTTPRequestHandler):
    healthy = True
    requests_seen: list[dict] = []

    def do_GET(self):
        if self.path == "/health":
            body = json.dumps(
                {"status": "ok" if type(self).healthy else "loading"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        type(self).requests_seen.append(payload)
        content = json.dumps(
            {"triples": [{"subj": "A", "pred": "uses", "obj": "B"}]}
        )
        body = json.dumps({"content": content}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def fake_server():
    _FakeLlamaServer.healthy = True
    _FakeLlamaServer.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeLlamaServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_backend_request_shape(fake_server):
    cfg = ExtractionConfig(
        backend="http", endpoint=fake_server, seed=42, temperature=0.0,
        parallel_slots=2, buffer_slots=2,
    )
    be = HttpBackend(cfg)
    out = be.complete(["prompt one", "prompt two"])
    assert len(out) == 2
    assert json.loads(out[0])["triples"][0]["pred"] == "uses"
    # request shape mirrors the reference payload
    # (webapp/llm_processing/routes.py:412-474)
    req = _FakeLlamaServer.requests_seen[0]
    assert req["seed"] == 42
    assert req["temperature"] == 0.0
    assert req["cache_prompt"] is True
    assert "prompt" in req and "n_predict" in req


def test_http_backend_health_gate(fake_server):
    _FakeLlamaServer.healthy = False
    cfg = ExtractionConfig(backend="http", endpoint=fake_server)
    be = HttpBackend(cfg)
    with pytest.raises(RuntimeError, match="not healthy"):
        be.complete(["x"])
    # recovery: once healthy, the gate opens and stays open
    _FakeLlamaServer.healthy = True
    assert len(be.complete(["x"])) == 1


def test_http_backend_requires_endpoint():
    with pytest.raises(ValueError, match="endpoint"):
        HttpBackend(ExtractionConfig(backend="http", endpoint=None))


def test_http_backend_through_pipeline(spark, fake_server):
    """mapInPandas harness with the HTTP backend end-to-end."""
    from llmaix_spark.operators.extraction import extract_triples

    t = spark.createDataFrame(
        [("c1", 0, "user", "whatever", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    cfg = ExtractionConfig(backend="http", endpoint=fake_server)
    triples, raw = extract_triples(t, cfg)
    rows = triples.collect()
    assert [(r["subj_surface"], r["pred"], r["obj_surface"]) for r in rows] == [
        ("A", "uses", "B")
    ]
