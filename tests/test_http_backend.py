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
    content, truncated = out[0]
    assert json.loads(content)["triples"][0]["pred"] == "uses"
    assert truncated is False
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


class _FakeChatServer(_FakeLlamaServer):
    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        type(self).requests_seen.append(
            {"path": self.path, **payload}
        )
        content = json.dumps(
            {"triples": [{"subj": "C", "pred": "manages", "obj": "D"}]}
        )
        body = json.dumps(
            {"choices": [{"message": {"role": "assistant", "content": content}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def fake_chat_server():
    _FakeChatServer.healthy = True
    _FakeChatServer.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeChatServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_chat_endpoint_mode(fake_chat_server):
    """L3: /v1/chat/completions with system+user messages + json_schema
    response_format (reference fetch_chat_result, routes.py:333-410)."""
    cfg = ExtractionConfig(
        backend="http", endpoint=fake_chat_server,
        json_schema={"type": "object"},
        extra={"endpoint_type": "chat"},
    )
    be = HttpBackend(cfg)
    out = be.complete(["extract this"])
    content, truncated = out[0]
    assert json.loads(content)["triples"][0]["pred"] == "manages"
    assert truncated is False
    req = _FakeChatServer.requests_seen[0]
    assert req["path"] == "/v1/chat/completions"
    assert req["messages"][0]["role"] == "system"
    assert req["messages"][1]["content"] == "extract this"
    assert req["response_format"]["type"] == "json_schema"
    assert req["response_format"]["json_schema"]["strict"] is True


def test_openai_mode_auth_and_limits(fake_chat_server):
    """L4: hosted-API branch — Authorization header, max_completion_tokens,
    no health gate (reference fetch_chat_result_openai, routes.py:256-331)."""
    cfg = ExtractionConfig(
        backend="http", endpoint=fake_chat_server, n_predict=777,
        extra={"endpoint_type": "openai", "api_key": "sk-test", "model": "gpt-x"},
    )
    be = HttpBackend(cfg)
    out = be.complete(["p"])
    assert len(out) == 1
    req = _FakeChatServer.requests_seen[0]
    assert req["max_completion_tokens"] == 777
    assert req["model"] == "gpt-x"


class _TruncatingServer(_FakeLlamaServer):
    """/completion that reports a length-stop (stop_type == 'limit')."""

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        json.loads(self.rfile.read(n))
        body = json.dumps(
            {"content": '{"triples": [{"su', "stop_type": "limit",
             "truncated": True}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


class _TruncatingChatServer(_FakeLlamaServer):
    """Chat endpoint that reports finish_reason == 'length'."""

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        json.loads(self.rfile.read(n))
        body = json.dumps(
            {"choices": [{"message": {"role": "assistant",
                                      "content": '{"triples": ['},
                          "finish_reason": "length"}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def truncating_server():
    _TruncatingServer.healthy = True
    srv = HTTPServer(("127.0.0.1", 0), _TruncatingServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture()
def truncating_chat_server():
    _TruncatingChatServer.healthy = True
    srv = HTTPServer(("127.0.0.1", 0), _TruncatingChatServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_completion_length_stop_flagged(truncating_server):
    """L8: stop_type == 'limit' on /completion surfaces as truncated=True
    (reference warning path, routes.py:513-535)."""
    be = HttpBackend(ExtractionConfig(backend="http", endpoint=truncating_server))
    (content, truncated), = be.complete(["p"])
    assert truncated is True
    assert content.startswith('{"triples"')


def test_chat_length_stop_flagged(truncating_chat_server):
    be = HttpBackend(ExtractionConfig(
        backend="http", endpoint=truncating_chat_server,
        extra={"endpoint_type": "chat"},
    ))
    (content, truncated), = be.complete(["p"])
    assert truncated is True


def test_truncated_column_reaches_raw_table(spark, truncating_server):
    """The flag must survive the mapInPandas plumbing into EXTRACTION_RAW
    and aggregate into run metrics."""
    from llmaix_spark.operators.extraction import (
        extract_triples,
        extraction_run_metrics,
    )

    t = spark.createDataFrame(
        [("c1", 0, "user", "text", None, None),
         ("c2", 0, "user", "more", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    cfg = ExtractionConfig(backend="http", endpoint=truncating_server)
    _triples, raw = extract_triples(t, cfg)
    rows = raw.collect()
    assert all(r["truncated"] for r in rows)
    m = extraction_run_metrics(raw).collect()[0]
    assert (m["n_conversations"], m["n_truncated"]) == (2, 2)


def test_stub_truncate_rate_sets_flag_and_metrics(spark):
    """StubBackend emits truncated outputs at a stable-hash rate: the
    column is non-constant, truncated rows carry cut content, and the
    run-metrics counter matches the flag count."""
    from llmaix_spark.operators.extraction import (
        StubBackend,
        extract_triples,
        extraction_run_metrics,
    )

    cfg = ExtractionConfig(truncate_rate=0.5, malformed_rate=0.0)
    be = StubBackend(cfg)
    outs = be.complete([f"Alice{i} works at Corp{i}" for i in range(40)])
    flags = [t for _, t in outs]
    assert any(flags) and not all(flags)  # non-constant at rate 0.5
    for content, truncated in outs:
        if truncated:
            assert not content.endswith("}")  # cut mid-JSON

    rows = [(f"c{i}", 0, "user", f"Alice{i} works at Corp{i}", None, None)
            for i in range(40)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    _triples, raw = extract_triples(t, cfg)
    m = extraction_run_metrics(raw).collect()[0]
    assert 0 < m["n_truncated"] < 40
    assert m["n_conversations"] == 40


class _FlakyServer(_FakeLlamaServer):
    """Every second completion request 500s."""
    counter = 0

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        type(self).counter += 1
        if type(self).counter % 2 == 0:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"boom")
            return
        content = json.dumps({"triples": [{"subj": "A", "pred": "uses", "obj": "B"}]})
        body = json.dumps({"content": content}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def flaky_server():
    _FlakyServer.healthy = True
    _FlakyServer.counter = 0
    srv = HTTPServer(("127.0.0.1", 0), _FlakyServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_failed_request_isolated_not_fatal(spark, flaky_server):
    """A failed request yields an error row; the batch — and the other
    rows — survive (reference routes.py:955-960 + its regression test
    test_anonymizer_postprocess.py:51-67)."""
    from llmaix_spark.operators.extraction import extract_triples

    rows = [
        (f"c{i}", 0, "user", "text", None, None) for i in range(6)
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).coalesce(1)  # one Arrow batch → one backend micro-batch
    cfg = ExtractionConfig(backend="http", endpoint=flaky_server)
    triples, raw = extract_triples(t, cfg)
    raw_rows = raw.collect()
    assert len(raw_rows) == 6  # every conversation row survived
    errs = [r for r in raw_rows if r["error"]]
    oks = [r for r in raw_rows if not r["error"]]
    assert len(errs) == 3 and len(oks) == 3
    assert triples.count() == 3
