"""Elasticsearch bulk sink with per-action reject capture.

Reference semantics (lambda/main.py:126-153): actions are chunked 500 per
bulk HTTP request (main.py:30, exactly one internal chunk per request —
main.py:146-147); per-action rejects are collected, not raised, and routed
to the dead-letter channel (main.py:149-153,163-172).

Spark shape: the es-hadoop connector can't capture per-document rejects,
so the sink runs inside ``foreachBatch``/``foreachPartition`` with a
pluggable client (SURVEY.md §7.4). Each executor partition opens one
client, sends its rows in fixed chunks, and RETURNS rejects as data — so
the reject stream is a DataFrame like any other, and the whole thing
scales horizontally with partitions (the reference was capped at one
single-threaded Lambda per shard).

The in-memory client exists for tests and local runs; a real HTTPS+SigV4
client drops into the same protocol without touching the operator.
"""

from __future__ import annotations

import json
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from terraform_aws_lambda_kinesis_to_es_spark.config import PipelineConfig


class BulkClient(Protocol):
    """One bulk call = one HTTP request (reference main.py:146-147).
    ``_source`` arrives as the VERBATIM JSON string on the engine path
    (bulk_index never parses it — the real HTTP client splices it straight
    into the NDJSON body); direct unit calls may pass dicts. Returns the
    rejected actions (empty list = all indexed)."""

    def bulk(self, actions: list[dict]) -> list[dict]: ...


def _src_dict(a: dict) -> dict:
    """Test-double helper: normalize an action's ``_source`` to a dict.
    The parse cost lives HERE (doubles only) — the production client
    (es_http.HttpElasticsearch) passes the string through untouched."""
    src = a["_source"]
    return {**a, "_source": json.loads(src) if isinstance(src, str) else src}


class InMemoryElasticsearch:
    """Process-local test double for direct (non-Spark) unit calls."""

    def __init__(self, reject_if=None) -> None:
        self.indexed: dict[str, list[dict]] = {}
        self.calls: list[int] = []
        self._reject_if = reject_if

    def bulk(self, actions: list[dict]) -> list[dict]:
        self.calls.append(len(actions))
        rejects = []
        for a in map(_src_dict, actions):
            if self._reject_if is not None and self._reject_if(a):
                rejects.append(a)
            else:
                self.indexed.setdefault(a["_index"], []).append(a["_source"])
        return rejects


class FileSystemElasticsearch:
    """Distributed test double: each bulk call writes one NDJSON file.

    Spark Python closures execute in separate worker PROCESSES even in
    local[N], so an in-memory stub mutated on workers is invisible to the
    driver; the filesystem is the shared medium (exactly how the real
    client's side effects — HTTP calls — escape the worker). One file per
    bulk call also lets tests assert the chunk-per-request contract
    (reference main.py:146-147)."""

    def __init__(self, base_dir: str, reject_if=None) -> None:
        self.base_dir = base_dir
        self._reject_if = reject_if

    def bulk(self, actions: list[dict]) -> list[dict]:
        import os
        import uuid

        os.makedirs(self.base_dir, exist_ok=True)
        rejects, indexed = [], []
        for a in map(_src_dict, actions):
            if self._reject_if is not None and self._reject_if(a):
                rejects.append(a)
            else:
                indexed.append(a)
        path = os.path.join(self.base_dir, f"call-{uuid.uuid4().hex}.ndjson")
        with open(path, "w") as f:
            f.write(json.dumps({"_call_size": len(actions)}) + "\n")
            for a in indexed:
                rec = {"_index": a["_index"], "_source": a["_source"]}
                if "_id" in a:
                    rec["_id"] = a["_id"]
                f.write(json.dumps(rec) + "\n")
        return rejects

    @staticmethod
    def read_indexed(base_dir: str) -> dict[str, list[dict]]:
        """Docs per index. Actions carrying ``_id`` upsert: the last write
        per (index, _id) wins, mirroring real ES index-by-id semantics."""
        import glob
        import os

        out: dict[str, list[dict]] = {}
        by_id: dict[tuple[str, str], dict] = {}
        for path in sorted(glob.glob(os.path.join(base_dir, "call-*.ndjson"))):
            with open(path) as f:
                for line in f:
                    obj = json.loads(line)
                    if "_call_size" in obj:
                        continue
                    if "_id" in obj:
                        by_id[(obj["_index"], obj["_id"])] = obj["_source"]
                    else:
                        out.setdefault(obj["_index"], []).append(obj["_source"])
        for (idx, _id), src in by_id.items():
            out.setdefault(idx, []).append(src)
        return out

    @staticmethod
    def read_call_sizes(base_dir: str) -> list[int]:
        import glob
        import os

        sizes = []
        for path in glob.glob(os.path.join(base_dir, "call-*.ndjson")):
            with open(path) as f:
                sizes.append(json.loads(f.readline())["_call_size"])
        return sizes


REJECT_SCHEMA = T.StructType(
    [
        T.StructField("_index", T.StringType()),
        T.StructField("_source", T.StringType()),
    ]
)


def bulk_index(
    actions_df: DataFrame,
    client_factory,
    cfg: PipelineConfig,
) -> DataFrame:
    """Index an actions DataFrame (columns ``_index``, ``_type``,
    ``_source`` as JSON string — routing.build_es_actions shape) and
    return the rejects as a DataFrame.

    Executes via Arrow-batched ``mapInArrow``: rows cross the JVM->Python
    boundary as Arrow columns (no per-row pickling), each partition opens
    ONE client (reference: one client per invocation, main.py:76-84) and
    sends ceil(n/chunk_size) bulk requests, chunked across Arrow-batch
    boundaries so every request except a partition's last carries exactly
    ``chunk_size`` actions (reference main.py:30,146-147). ``_source`` is
    already the verbatim JSON string, and it stays a string end-to-end —
    the real HTTP client splices it into the NDJSON body with zero
    parse/re-serialize per row (the old path paid json.loads + json.dumps
    on every record). Rejects stream back one Arrow batch per bulk call,
    so reject memory is bounded by chunk_size, not partition size.
    """
    chunk_size = cfg.bulk_chunk_size
    has_id = "_id" in actions_df.columns

    def _send(batches):
        import pyarrow as pa

        client = None
        buf: list[dict] = []

        def flush():
            nonlocal client
            if client is None:
                client = client_factory()
            rejects = client.bulk(buf)
            buf.clear()
            if not rejects:
                return None
            return pa.RecordBatch.from_pydict(
                {
                    "_index": [r["_index"] for r in rejects],
                    "_source": [
                        s if isinstance(s, str) else json.dumps(s)
                        for s in (r["_source"] for r in rejects)
                    ],
                }
            )

        for batch in batches:
            idx = batch.column("_index").to_pylist()
            src = batch.column("_source").to_pylist()
            ids = batch.column("_id").to_pylist() if has_id else None
            for i in range(len(idx)):
                a = {"_index": idx[i], "_type": "_doc", "_source": src[i]}
                if ids is not None and ids[i] is not None:
                    a["_id"] = ids[i]
                buf.append(a)
                if len(buf) == chunk_size:
                    rb = flush()
                    if rb is not None:
                        yield rb
        if buf:
            rb = flush()
            if rb is not None:
                yield rb

    cols = ["_index", "_source"] + (["_id"] if has_id else [])
    return actions_df.select(*cols).mapInArrow(_send, REJECT_SCHEMA)
