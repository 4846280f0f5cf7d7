"""Throughput benchmark for the stateful streaming near-dup operator
(PERF.md 'streaming near-dup' rows — VERDICT r4 #4).

Stages N synthetic docs with a KNOWN dup density (every DUP_EVERY-th doc
is a one-token edit of the doc LOOKBACK positions earlier, so expected
pairs ~= N/DUP_EVERY when the horizon covers the lookback gap) as
file-source micro-batches with event times spread uniformly over
SPAN_MIN minutes, then drives streaming.stateful.near_dup_stream at the
given watermark horizon. The per-arrival cost is bucket-occupancy-bound;
this bench SHOWS it instead of arguing it: rec/s plus the state-store
row counts from the progress listener (numRowsTotal across the run — the
horizon directly sets how many signature rows each 15-bit block bucket
retains, so halving the horizon should shrink state, not throughput).

Run: python examples/near_dup_stream_bench.py [n_docs] [horizon] [n_files]
e.g.  python examples/near_dup_stream_bench.py 100000 "30 minutes" 20
Prints one JSON line:
{records, horizon, seconds, records_per_sec, pairs, state_rows_max}.
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

SPAN_MIN = 240          # event-time spread of the whole corpus (minutes)
DUP_EVERY = 10          # every 10th doc is a near-copy -> 10% dup density
LOOKBACK = 50           # ...of the doc 50 positions earlier
TOKENS = 20             # tokens per doc
VOCAB = 5000


def _doc_text(i: int) -> str:
    # deterministic pseudo-random token stream; distinct docs share few
    # shingles, near-dups differ in exactly the final token
    return " ".join(f"tok{(i * 31 + j * 7) % VOCAB}" for j in range(TOKENS))


def stage(src_dir: str, n_docs: int, n_files: int) -> int:
    per_file = n_docs // n_files
    n_dups = 0
    i = 0
    base_mtime = time.time() - n_files - 10
    for f in range(n_files):
        path = f"{src_dir}/b{f:05d}.json"
        with open(path, "w") as fh:
            for _ in range(per_file):
                if i >= LOOKBACK and i % DUP_EVERY == 0:
                    text = _doc_text(i - LOOKBACK).rsplit(" ", 1)[0] + " tokX"
                    n_dups += 1
                else:
                    text = _doc_text(i)
                minute = (i * SPAN_MIN) // n_docs
                ts = f"2024-03-01T{10 + minute // 60:02d}:{minute % 60:02d}:00"
                fh.write(
                    json.dumps({"doc_id": i, "text": text, "doc_ts": ts}) + "\n"
                )
                i += 1
        # file-source ordering follows modification time: stamp ascending
        os.utime(path, (base_mtime + f, base_mtime + f))
    return n_dups


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    horizon = sys.argv[2] if len(sys.argv) > 2 else "1 hour"
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    # micro-batch cadence: files per trigger. Default comes from the
    # sizing helper the r6 decomposition produced (per-batch stateful
    # overhead — not the compare — dominates, so the cadence IS the
    # throughput lever): suggest_files_per_trigger(5000 records/file)
    # returns 8 with the fitted host constants, the measured-best
    # cadence of the r6 sweep. Pass an explicit 4th arg to override
    # (e.g. to reproduce the 2-file r5 comparison rows).
    trigger_files = (
        int(sys.argv[4])
        if len(sys.argv) > 4
        else stateful.suggest_files_per_trigger(n_docs / n_files)
    )

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="nd_stream_bench_")
    src = f"{work}/src"
    os.makedirs(src)
    n_dups = stage(src, n_docs, n_files)

    stream = (
        spark.readStream.schema("doc_id long, text string, doc_ts timestamp")
        .option("maxFilesPerTrigger", trigger_files)
        .json(src)
    )
    out = stateful.near_dup_stream(stream, watermark=horizon)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .queryName("nd_bench")
        .start()
    )
    q.awaitTermination(1200)
    secs = time.time() - t0
    state_rows = [
        so.get("numRowsTotal", 0)
        for p in q.recentProgress
        for so in (p.get("stateOperators") or [])
    ]
    # pairs emitted: count from a second batch read of the sink is not
    # possible with noop; re-run the match count cheaply from the known
    # staging contract instead (pairs ~= n_dups when horizon >= lookback
    # gap). Report the staged expectation for context.
    print(
        json.dumps(
            {
                "records": n_docs,
                "horizon": horizon,
                "trigger_files": trigger_files,
                "micro_batches": (n_files + trigger_files - 1) // trigger_files,
                "seconds": round(secs, 2),
                "records_per_sec": round(n_docs / secs),
                "staged_dups": n_dups,
                "state_rows_max": max(state_rows) if state_rows else None,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
