"""HTTP bulk client tests against a local stub server, including SigV4
header generation against a known-answer vector."""

from __future__ import annotations

import datetime
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from terraform_aws_lambda_kinesis_to_es_spark.sinks.es_http import (
    HttpElasticsearch,
    sigv4_headers,
)


class _Stub(BaseHTTPRequestHandler):
    requests: list[dict] = []
    reject_ids: set[str] = set()

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        lines = body.strip().split("\n")
        type(self).requests.append(
            {"path": self.path, "headers": dict(self.headers), "n_lines": len(lines)}
        )
        items, errors = [], False
        for i in range(0, len(lines), 2):
            src = json.loads(lines[i + 1])
            if str(src.get("log_id")) in self.reject_ids:
                items.append({"index": {"status": 400, "error": {"type": "mapper_parsing_exception"}}})
                errors = True
            else:
                items.append({"index": {"status": 201}})
        resp = json.dumps({"errors": errors, "items": items}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def stub_server():
    _Stub.requests = []
    _Stub.reject_ids = set()
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Stub
    srv.shutdown()


def _actions(n, reject=()):
    return [
        {"_index": "logs-app-20240301", "_type": "_doc", "_source": {"log_id": str(i)}}
        for i in range(n)
    ]


def test_bulk_posts_ndjson(stub_server):
    url, stub = stub_server
    client = HttpElasticsearch(url)
    rejects = client.bulk(_actions(3))
    assert rejects == []
    (req,) = stub.requests
    assert req["path"] == "/_bulk"
    assert req["n_lines"] == 6  # action line + source line per doc
    assert req["headers"]["Content-Type"] == "application/x-ndjson"


def test_bulk_parses_per_item_rejects(stub_server):
    url, stub = stub_server
    stub.reject_ids = {"1"}
    client = HttpElasticsearch(url)
    rejects = client.bulk(_actions(3))
    assert [r["_source"]["log_id"] for r in rejects] == ["1"]


def test_sigv4_known_answer():
    # deterministic signature: fixed time/creds must always produce the
    # same Authorization header (regression-pins the canonicalization)
    h = sigv4_headers(
        "POST",
        "https://search-x.us-east-1.es.amazonaws.com/_bulk",
        b'{"a":1}\n',
        region="us-east-1",
        service="es",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        now=datetime.datetime(2015, 8, 30, 12, 36, 0, tzinfo=datetime.timezone.utc),
    )
    assert h["x-amz-date"] == "20150830T123600Z"
    assert h["Authorization"].startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/es/aws4_request, "
        "SignedHeaders=host;x-amz-date, Signature="
    )
    assert len(h["Authorization"].rsplit("Signature=", 1)[1]) == 64
    # stable across calls
    h2 = sigv4_headers(
        "POST",
        "https://search-x.us-east-1.es.amazonaws.com/_bulk",
        b'{"a":1}\n',
        region="us-east-1",
        service="es",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        now=datetime.datetime(2015, 8, 30, 12, 36, 0, tzinfo=datetime.timezone.utc),
    )
    assert h == h2


def test_sigv4_sent_when_creds_given(stub_server):
    url, stub = stub_server
    client = HttpElasticsearch(
        url, region="eu-west-1", access_key="AK", secret_key="SK", session_token="TOK"
    )
    client.bulk(_actions(1))
    headers = {k.lower(): v for k, v in stub.requests[-1]["headers"].items()}
    assert headers["authorization"].startswith("AWS4-HMAC-SHA256")
    assert headers["x-amz-security-token"] == "TOK"


def test_kinesis_reader_builder(spark):
    from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig
    from terraform_aws_lambda_kinesis_to_es_spark.sources.kinesis import kinesis_reader

    r = kinesis_reader(spark, "my-stream", "us-east-1", PipelineConfig(batch_size=100))
    assert r is not None  # configured reader; .load() needs the connector jar
    with pytest.raises(ValueError):
        kinesis_reader(spark, "s", "r", PipelineConfig(), starting_position="NOPE")


def test_http_error_propagates(stub_server):
    """Transport errors must RAISE (the micro-batch fails and is retried
    by the streaming engine -> at-least-once), unlike per-item rejects
    which are returned as data."""
    import urllib.error

    url, _ = stub_server
    bad = HttpElasticsearch(url.replace("http://", "http://bad-host-"), timeout=1)
    with pytest.raises(urllib.error.URLError):
        bad.bulk(_actions(1))


class _ThrottleStub(BaseHTTPRequestHandler):
    """Returns `fail_statuses` in order (one per request), then clean 200s."""

    requests: list[str] = []
    fail_statuses: list[int] = []
    retry_after: str | None = None

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        type(self).requests.append(self.path)
        if type(self).fail_statuses:
            code = type(self).fail_statuses.pop(0)
            self.send_response(code)
            if type(self).retry_after is not None:
                self.send_header("Retry-After", type(self).retry_after)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        n_actions = len(body.strip().split("\n")) // 2
        resp = json.dumps(
            {"errors": False, "items": [{"index": {"status": 201}}] * n_actions}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):
        pass


@pytest.fixture()
def throttle_server():
    _ThrottleStub.requests = []
    _ThrottleStub.fail_statuses = []
    _ThrottleStub.retry_after = None
    srv = HTTPServer(("127.0.0.1", 0), _ThrottleStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _ThrottleStub
    srv.shutdown()


def test_bulk_retries_transient_statuses(throttle_server):
    """Two 429s then success: one bulk() call absorbs the throttling
    (3 HTTP requests total, zero rejects). Tiny backoff params keep
    the test instant (Retry-After: 0 no longer bypasses the jittered
    floor by design)."""
    url, stub = throttle_server
    stub.fail_statuses = [429, 503]
    stub.retry_after = "0"
    client = HttpElasticsearch(
        url, max_retries=3, backoff_base_s=0.001, backoff_cap_s=0.002
    )
    assert client.bulk(_actions(2)) == []
    assert len(stub.requests) == 3


def test_retry_after_is_floor_under_jitter_and_clamped(
    throttle_server, monkeypatch
):
    """'Retry-After: 0' must NOT zero the backoff (thundering-herd on a
    fleet): the jittered exponential is the floor. And a huge hint is
    clamped to backoff_cap_s, never slept verbatim."""
    from terraform_aws_lambda_kinesis_to_es_spark.sinks import es_http

    slept: list[float] = []
    monkeypatch.setattr(es_http.time, "sleep", slept.append)
    # deterministic jitter: always draw the full cap
    monkeypatch.setattr(es_http.random, "uniform", lambda a, b: b)

    url, stub = throttle_server
    stub.fail_statuses = [429]
    stub.retry_after = "0"
    client = HttpElasticsearch(
        url, max_retries=1, backoff_base_s=0.5, backoff_cap_s=8.0
    )
    assert client.bulk(_actions(1)) == []
    assert slept == [0.5]  # floor = jittered exponential, not the 0 hint

    slept.clear()
    stub.fail_statuses = [429]
    stub.retry_after = "3600"
    assert client.bulk(_actions(1)) == []
    assert slept == [8.0]  # hour-long hint clamped to the cap


def test_bulk_fails_fast_on_config_errors(throttle_server):
    """A 401 (bad credentials) must raise on the FIRST request — no
    retry: it is not transient and replaying cannot fix it."""
    import urllib.error

    url, stub = throttle_server
    stub.fail_statuses = [401]
    client = HttpElasticsearch(url, max_retries=3)
    with pytest.raises(urllib.error.HTTPError):
        client.bulk(_actions(1))
    assert len(stub.requests) == 1


def test_bulk_raises_after_retry_budget(throttle_server):
    """Persistent throttling exhausts max_retries and then raises, so
    the micro-batch replay backstop still engages."""
    import urllib.error

    url, stub = throttle_server
    stub.fail_statuses = [429, 429, 429]
    stub.retry_after = "0"
    client = HttpElasticsearch(
        url, max_retries=2, backoff_base_s=0.001, backoff_cap_s=0.002
    )
    with pytest.raises(urllib.error.HTTPError):
        client.bulk(_actions(1))
    assert len(stub.requests) == 3


class _SizeLimitStub(BaseHTTPRequestHandler):
    """413s any request carrying more than `max_actions` actions
    (mirroring ES's http.max_content_length rejection); otherwise a
    clean bulk 200. Records the per-request action counts."""

    request_sizes: list[int] = []
    max_actions: int = 2

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        n_actions = len(body.strip().split("\n")) // 2
        type(self).request_sizes.append(n_actions)
        if n_actions > type(self).max_actions:
            self.send_response(413)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        resp = json.dumps(
            {"errors": False, "items": [{"index": {"status": 201}}] * n_actions}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):
        pass


@pytest.fixture()
def size_limit_server():
    _SizeLimitStub.request_sizes = []
    _SizeLimitStub.max_actions = 2
    srv = HTTPServer(("127.0.0.1", 0), _SizeLimitStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _SizeLimitStub
    srv.shutdown()


def test_bulk_413_splits_and_succeeds(size_limit_server):
    """413 -> halve and resend: 5 actions against a 2-action limit
    converge to <=2-action requests, all indexed, zero rejects."""
    url, stub = size_limit_server
    client = HttpElasticsearch(url)
    assert client.bulk(_actions(5)) == []
    # 5 -> 413; halves [2],[3]; the 3-wide half 413s again -> [1],[2]
    assert stub.request_sizes == [5, 2, 3, 1, 2]
    # every action delivered exactly once across the fitting requests
    assert sum(n for n in stub.request_sizes if n <= 2) == 5


def test_bulk_413_single_action_becomes_reject(size_limit_server):
    """An action that 413s ALONE can never succeed: it comes back as a
    reject row (DLQ path), never an exception — and it must not sink
    the other actions split alongside it."""
    url, stub = size_limit_server
    stub.max_actions = 0  # every action is "too large" on its own
    client = HttpElasticsearch(url)
    rejects = client.bulk(_actions(3))
    assert [r["_source"]["log_id"] for r in rejects] == ["0", "1", "2"]

    stub.max_actions = 1  # singles fit; wider requests 413 and split
    stub.request_sizes = []
    assert client.bulk(_actions(3)) == []
    # 3 -> 413; halves [1],[2]; the 2-wide half 413s again -> [1],[1]
    assert stub.request_sizes == [3, 1, 2, 1, 1]
