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
    (3 HTTP requests total, zero rejects). Retry-After: 0 keeps the
    test instant and pins the header being honored."""
    url, stub = throttle_server
    stub.fail_statuses = [429, 503]
    stub.retry_after = "0"
    client = HttpElasticsearch(url, max_retries=3)
    assert client.bulk(_actions(2)) == []
    assert len(stub.requests) == 3


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
    client = HttpElasticsearch(url, max_retries=2)
    with pytest.raises(urllib.error.HTTPError):
        client.bulk(_actions(1))
    assert len(stub.requests) == 3
