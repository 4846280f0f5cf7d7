"""Throughput benchmark for the streaming analytics operators
(heavy_hitters_stream, anomaly_stream, silence_stream) — PERF.md
'streaming analytics' rows.

Stages N synthetic log rows (Zipf-ish item skew across GROUPS group
keys, so the heavy-hitter tables have real work) as file-source
micro-batches, then drives each operator end-to-end with availableNow
and reports wall + rec/s. All three operators keep CONSTANT state per
key (cap counter triples / window longs / one long + timer), so
throughput should track the near-dup bench's per-batch overhead model,
not the corpus.

silence_stream additionally gets a DETECTION-LATENCY experiment
(VERDICT r8 #4): a live processingTime-trigger stream with a writer
thread that keeps half the keys alive and lets the other half go
silent; the report records, per silenced key, the wall-clock gap
between (last row written + silence_ms) and the silent=true row
landing in the sink. The structured-streaming contract is
silence_ms + one trigger interval + one batch's processing time;
the emitted p50/max latencies measure that contract.

Run: python examples/stream_analytics_bench.py [n_rows] [n_files]
e.g.  python examples/stream_analytics_bench.py 200000 8
One JSON line per operator (+ one for the latency experiment).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark
from terraform_aws_lambda_kinesis_to_es_spark.streaming import stateful

GROUPS = 32
ITEMS = 10_000


def _item(i: int) -> str:
    # skewed: ~10% of rows hit item 0 of the group, long tail elsewhere
    if i % 10 == 0:
        return "hot"
    return f"u{(i * 131) % ITEMS}"


def stage(src_dir: str, n_rows: int, n_files: int) -> int:
    per_file = n_rows // n_files
    base = time.time() - n_files - 10
    i = 0
    for f in range(n_files):
        path = f"{src_dir}/b{f:05d}.json"
        with open(path, "w") as fh:
            for _ in range(per_file):
                row = {
                    "log_id": _item(i),
                    "log_type": f"g{i % GROUPS}",
                    "log_ts": "2024-03-01T10:00:00",
                }
                fh.write(json.dumps(row) + "\n")
                i += 1
        os.utime(path, (base + f, base + f))
    return i  # actual staged rows (n_files * per_file, not n_rows)


def drive(spark, src_dir: str, op, name: str, n_rows: int) -> dict:
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    stream = (
        spark.readStream.schema("log_id string, log_type string, log_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    t0 = time.perf_counter()
    q = (
        op(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    wall = time.perf_counter() - t0
    if not finished:
        # a timed-out stream would otherwise report inflated rec/s,
        # have its live checkpoint deleted, and contend with the next
        # benchmark — stop it and fail loudly instead
        q.stop()
        raise RuntimeError(f"{name} did not finish within 600s")
    shutil.rmtree(ck, ignore_errors=True)
    return {
        "op": name,
        "records": n_rows,
        "seconds": round(wall, 1),
        "records_per_sec": int(n_rows / wall),
    }


def drive_silence(spark, src_dir: str, n_rows: int) -> dict:
    """Throughput drive for silence_stream: an availableNow query with
    ProcessingTimeTimeout timers can stay alive polling for further
    expirations after the input drain, so termination is 'all staged
    rows ingested' (recentProgress numInputRows), not query exit."""
    ck = tempfile.mkdtemp(prefix="ck_silence_")
    stream = (
        spark.readStream.schema("log_id string, log_type string, log_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    t0 = time.perf_counter()
    q = (
        stateful.silence_stream(stream, silence_ms=60_000)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 600
    # recentProgress is a ring buffer capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100); with
    # maxFilesPerTrigger=1 and >100 staged files a plain sum over it
    # undercounts forever (ADVICE r9) — accumulate per new batchId.
    ingested = 0
    seen_batches: set[int] = set()
    while time.time() < deadline:
        if q.awaitTermination(2):
            break
        for p in q.recentProgress:
            if p["batchId"] not in seen_batches:
                seen_batches.add(p["batchId"])
                ingested += p["numInputRows"]
        if ingested >= n_rows:
            break
    else:
        q.stop()
        raise RuntimeError("silence_stream did not ingest all rows within 600s")
    wall = time.perf_counter() - t0
    if q.isActive:
        q.stop()
    shutil.rmtree(ck, ignore_errors=True)
    return {
        "op": "silence_stream",
        "records": n_rows,
        "seconds": round(wall, 1),
        "records_per_sec": int(n_rows / wall),
    }


def silence_latency(
    spark,
    silence_ms: int = 3_000,
    trigger: str = "500 milliseconds",
    n_keys: int = 16,
    live_s: float = 6.0,
) -> dict:
    """Detection-latency experiment: keys g0..g{n/2-1} keep producing
    for ``live_s`` seconds, g{n/2}..g{n-1} stop after the first file.
    The memory sink is polled on a side thread that stamps the wall
    clock the FIRST time each key's silent=true row is visible; latency
    per silenced key = t(visible) - t(last row written) - silence_ms.
    The operator's contract bounds it by one trigger interval plus one
    batch's processing time."""
    import threading

    src = tempfile.mkdtemp(prefix="silence_lat_src_")
    ck = tempfile.mkdtemp(prefix="ck_silence_lat_")
    keys = [f"g{i}" for i in range(n_keys)]
    silenced = set(keys[n_keys // 2 :])

    def write_file(idx: int, ks: list[str]) -> float:
        path = f"{src}/b{idx:05d}.json"
        with open(path, "w") as fh:
            for k in ks:
                fh.write(
                    json.dumps(
                        {"log_id": k, "log_type": k, "log_ts": "2024-03-01T10:00:00"}
                    )
                    + "\n"
                )
        return time.time()

    t0_write = write_file(0, keys)
    last_written = {k: t0_write for k in keys}

    stream = (
        spark.readStream.schema("log_id string, log_type string, log_ts timestamp")
        .json(src)
    )
    q = (
        stateful.silence_stream(stream, silence_ms=silence_ms)
        .writeStream.format("memory")
        .queryName("silence_lat")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(processingTime=trigger)
        .start()
    )

    detected: dict[str, float] = {}
    stop_poll = threading.Event()

    def poll() -> None:
        while not stop_poll.is_set():
            now = time.time()
            for r in spark.table("silence_lat").collect():
                if r.silent and r.grp not in detected:
                    detected[r.grp] = now
            if silenced <= set(detected):
                return
            time.sleep(0.1)

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()

    # keep the live half producing so micro-batches (and thus timer
    # sweeps) keep firing while the silenced half's timers expire
    t_end = time.time() + live_s
    idx = 1
    while time.time() < t_end:
        t = write_file(idx, keys[: n_keys // 2])
        for k in keys[: n_keys // 2]:
            last_written[k] = t
        idx += 1
        time.sleep(0.5)
    poller.join(timeout=60)
    stop_poll.set()
    q.stop()
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)

    lats = sorted(
        detected[k] - last_written[k] - silence_ms / 1000.0
        for k in silenced
        if k in detected
    )
    return {
        "op": "silence_stream_latency",
        "silence_ms": silence_ms,
        "trigger": trigger,
        "n_silenced": len(silenced),
        "n_detected": len(lats),
        "latency_p50_s": round(lats[len(lats) // 2], 2) if lats else None,
        "latency_max_s": round(lats[-1], 2) if lats else None,
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "stream_analytics_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    src = tempfile.mkdtemp(prefix="stream_analytics_src_")
    staged_rows = stage(src, n_rows, n_files)
    print(
        json.dumps(
            drive(
                spark,
                src,
                lambda s: stateful.heavy_hitters_stream(s, cap=16, topn=5),
                "heavy_hitters_stream",
                staged_rows,
            )
        ),
        flush=True,
    )
    print(
        json.dumps(
            drive(spark, src, stateful.anomaly_stream, "anomaly_stream", staged_rows)
        ),
        flush=True,
    )
    # silence_stream throughput on the same corpus (the final availableNow
    # timer drain marks every key silent — irrelevant to wall/rec/s)
    print(json.dumps(drive_silence(spark, src, staged_rows)), flush=True)
    print(json.dumps(silence_latency(spark)), flush=True)
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
