"""Real HTTP bulk client: stdlib-only Elasticsearch `_bulk` with optional
AWS SigV4 request signing.

Reference parity (K1): HTTPS:443, SigV4 auth from ambient AWS credentials,
CA-verified TLS, 30 s timeout, one HTTP request per 500-action chunk
(reference lambda/main.py:29,52-58,76-84,146-147). Implemented on urllib +
hmac/hashlib (the SigV4 canonical-request algorithm is public AWS
documentation) so the engine adds no non-public dependencies; drops into
``sinks.es.bulk_index`` via the same BulkClient protocol as the test
doubles.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import json
import random
import time
import urllib.error
import urllib.request


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_headers(
    method: str,
    url: str,
    body: bytes,
    *,
    region: str,
    service: str,
    access_key: str,
    secret_key: str,
    session_token: str | None = None,
    now: datetime.datetime | None = None,
) -> dict[str, str]:
    """AWS Signature Version 4 headers for one request (public algorithm:
    canonical request -> string-to-sign -> derived signing key)."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    host = parts.netloc
    path = parts.path or "/"
    now = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()

    headers = {"host": host, "x-amz-date": amz_date}
    if session_token:
        headers["x-amz-security-token"] = session_token
    signed_headers = ";".join(sorted(headers))
    canonical_headers = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
    canonical_request = "\n".join(
        [method, path, parts.query, canonical_headers, signed_headers, payload_hash]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    k = _hmac(f"AWS4{secret_key}".encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    auth = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    out = {"Authorization": auth, "x-amz-date": amz_date}
    if session_token:
        out["x-amz-security-token"] = session_token
    return out


#: HTTP statuses worth an in-call retry: throttling and transient
#: gateway failures. 4xx config/mapping errors and connection-level
#: failures fail fast — the checkpointed micro-batch replay owns those.
TRANSIENT_STATUSES = frozenset({429, 502, 503, 504})


class HttpElasticsearch:
    """BulkClient over HTTP(S). One ``bulk()`` call = one ``_bulk``
    request; per-item errors are returned as rejects, never raised
    (reference main.py:149-153).

    Whole-request failures with a TRANSIENT status (429/502/503/504)
    retry in-call with capped exponential backoff + jitter (honoring
    ``Retry-After`` when the server sends one). Retrying is only
    exactly-once for actions that carry ``_id`` (index-by-id is
    idempotent); auto-id actions can double-index when the backend
    applied the write before the transient status — the same
    at-least-once class the micro-batch replay already has, so the
    retry changes latency, not the delivery contract. The reference
    has no client-side retry (Lambda redelivery fills that role,
    main.py:76-84); here the in-call retry avoids failing a whole
    micro-batch — and re-running every other record in it — for one
    throttled HTTP round trip.

    A 413 (payload too large) is not retryable-by-backoff: the request
    is split in half and each half resent; a single action that still
    413s is returned as a reject row (it can never succeed), never
    raised. Anything else still raises so the at-least-once replay
    path stays the backstop."""

    def __init__(
        self,
        base_url: str,
        *,
        timeout: int = 30,
        region: str | None = None,
        access_key: str | None = None,
        secret_key: str | None = None,
        session_token: str | None = None,
        service: str = "es",
        max_retries: int = 3,
        backoff_base_s: float = 0.5,
        backoff_cap_s: float = 8.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.backoff_cap_s = backoff_cap_s
        self._sig = None
        if region and access_key and secret_key:
            self._sig = {
                "region": region,
                "service": service,
                "access_key": access_key,
                "secret_key": secret_key,
                "session_token": session_token,
            }

    def bulk(self, actions: list[dict]) -> list[dict]:
        if not actions:
            return []
        lines = []
        for a in actions:
            meta = {"_index": a["_index"], "_type": a.get("_type", "_doc")}
            if a.get("_id") is not None:
                meta["_id"] = a["_id"]
            lines.append(json.dumps({"index": meta}))
            src = a["_source"]
            lines.append(src if isinstance(src, str) else json.dumps(src))
        body = ("\n".join(lines) + "\n").encode()
        url = f"{self.base_url}/_bulk"
        try:
            payload = self._post_with_retry(url, body)
        except urllib.error.HTTPError as exc:
            # 413: the body exceeded http.max_content_length. Backoff
            # cannot shrink a payload — halve and resend each side
            # (depth <= log2(chunk) ~ 9 for the 500-action cap). One
            # action still over the limit is a permanent per-action
            # failure: surface it as a reject row for the DLQ, exactly
            # like a mapping error, never an exception.
            if exc.code != 413:
                raise
            exc.close()
            if len(actions) == 1:
                return list(actions)
            mid = len(actions) // 2
            return self.bulk(actions[:mid]) + self.bulk(actions[mid:])
        rejects: list[dict] = []
        if payload.get("errors"):
            for action, item in zip(actions, payload.get("items", [])):
                info = item.get("index", item.get("create", {}))
                if info.get("error"):
                    rejects.append(action)
        return rejects

    def _post_with_retry(self, url: str, body: bytes) -> dict:
        """POST, retrying only TRANSIENT_STATUSES up to max_retries with
        capped exponential backoff + full jitter. Retry-After is honored
        as a floor under the jittered exponential (so "Retry-After: 0"
        still backs off and desynchronizes a fleet) and CLAMPED to
        backoff_cap_s — an hour-long server hint must not block an
        executor thread (past the cap, failing into the micro-batch
        replay is cheaper than sleeping). The request is
        (re)built — and re-SIGNED — per attempt: a SigV4 signature
        carries x-amz-date and expires within minutes, so resending a
        pre-throttle signature after a long backoff would be rejected.
        The caught error response is closed before sleeping so the
        socket is not held across the backoff. Everything else
        propagates immediately."""
        attempt = 0
        while True:
            headers = {"Content-Type": "application/x-ndjson"}
            if self._sig:
                headers.update(sigv4_headers("POST", url, body, **self._sig))
            req = urllib.request.Request(
                url, data=body, headers=headers, method="POST"
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read())
            except urllib.error.HTTPError as exc:
                if exc.code not in TRANSIENT_STATUSES or attempt >= self.max_retries:
                    raise
                retry_after = (exc.headers or {}).get("Retry-After")
                exc.close()
                cap = min(self.backoff_cap_s, self.backoff_base_s * (2**attempt))
                delay = random.uniform(0, cap)
                if retry_after is not None and str(retry_after).isdigit():
                    # Honor the server hint as a FLOOR under the jittered
                    # exponential, clamped to the cap — a literal
                    # "Retry-After: 0" from a throttling server must not
                    # turn max_retries into a zero-backoff thundering
                    # herd across a fleet of executors.
                    delay = min(
                        max(float(retry_after), delay), self.backoff_cap_s
                    )
                time.sleep(delay)
                attempt += 1
