"""Materialize the standing /tmp scale corpora every pre-promotion
100x harness reads — committed so the recipes survive /tmp clears
(rounds 6-10 rebuilt them from session notes; this makes the rebuild
one command).

Corpora (idempotent: each is skipped when its marker table exists,
``--force`` rebuilds):

- ``/tmp/sf_family100x`` — documents + embeddings at 100x with
  REALISTIC (non-clique) duplicate density and collision-free id
  remapping; delegates to :func:`examples.family_scale_sweep.materialize`
  (the bucket-occupancy- and id-uniqueness-preserving recipe PERF.md
  rounds 5-6 derived the hard way).
- ``/tmp/sf_events100x`` — events at 100x with per-replica user/event
  id shifts (``key*100 + r``, r=0 participates — the collision-free
  rule): 100x the users, each keeping the ORIGINAL per-user history,
  so keyed aggregates scale linearly while per-key state stays
  constant. Split into 32 files (single-file scan-partition trap,
  PERF.md round-6).
- ``/tmp/sf_orders100x_b`` — orders at 100x (o_orderkey + o_custkey
  shifted consistently), 32 files.
- ``/tmp/sf_join100x`` — the 100x-fact x 1x-dimension join corpus:
  orders at 100x with ONLY o_orderkey shifted (o_custkey kept
  verbatim so every fact still hits the UNSHIFTED sf0.1 customer
  dimension — r10 ADVICE: reusing sf_orders100x_b here shifted
  o_custkey too, so ~99% of facts lost their FK and join output
  stayed ~1x instead of scaling with the facts), customer symlinked
  to sf0.1 (facts scale, dimensions don't — the realistic
  join-growth mode q_join_size_est measures).

``/tmp/sf_customer100x`` is NOT built here: audit_queries_scale.py
self-materializes it (names must be REGENERATED from the remapped
custkey or linkage blocks go quadratic — see its docstring).

Run: python examples/materialize_corpora.py [--force]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
FAMILY_DIR = "/tmp/sf_family100x"
EVENTS_DIR = "/tmp/sf_events100x"
ORDERS_DIR = "/tmp/sf_orders100x_b"
JOIN_DIR = "/tmp/sf_join100x"


def _replicate_shifted(spark, table: str, keys: list[str], out: str) -> None:
    """key*REPLICAS + r on every id-like column, r=0 included (the
    collision-free rule: leaving originals unmapped once produced ~3%
    duplicate ids and silently merged distinct rows in keyed paths —
    verify SKILL round-6 note)."""
    base = spark.read.parquet(f"{SRC}/{table}.parquet")
    reps = []
    for r in range(REPLICAS):
        rep = base
        for k in keys:
            rep = rep.withColumn(k, F.col(k) * REPLICAS + F.lit(r))
        reps.append(rep)
    df = reps[0]
    for rep in reps[1:]:
        df = df.unionByName(rep)
    df.repartition(32).write.mode("overwrite").parquet(out)


def _done(path: str, table: str) -> bool:
    return os.path.isdir(f"{path}/{table}.parquet")


def main() -> None:
    force = "--force" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "materialize_corpora", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    if force or not _done(FAMILY_DIR, "documents"):
        from family_scale_sweep import materialize as materialize_family

        materialize_family(spark, FAMILY_DIR, REPLICAS)
        print(f"built {FAMILY_DIR}", file=sys.stderr)
    else:
        print(f"kept {FAMILY_DIR}", file=sys.stderr)

    if force or not _done(EVENTS_DIR, "events"):
        os.makedirs(EVENTS_DIR, exist_ok=True)
        _replicate_shifted(
            spark, "events", ["event_id", "user_id"], f"{EVENTS_DIR}/events.parquet"
        )
        print(f"built {EVENTS_DIR}", file=sys.stderr)
    else:
        print(f"kept {EVENTS_DIR}", file=sys.stderr)

    if force or not _done(ORDERS_DIR, "orders"):
        os.makedirs(ORDERS_DIR, exist_ok=True)
        _replicate_shifted(
            spark,
            "orders",
            ["o_orderkey", "o_custkey"],
            f"{ORDERS_DIR}/orders.parquet",
        )
        print(f"built {ORDERS_DIR}", file=sys.stderr)
    else:
        print(f"kept {ORDERS_DIR}", file=sys.stderr)

    if force and os.path.isdir(JOIN_DIR):
        shutil.rmtree(JOIN_DIR)
    # a pre-existing JOIN_DIR whose orders is a SYMLINK is the broken
    # pre-r11 recipe (o_custkey shifted out of the dimension's key
    # space) — rebuild it even without --force
    if os.path.islink(f"{JOIN_DIR}/orders.parquet"):
        shutil.rmtree(JOIN_DIR)
    if not _done(JOIN_DIR, "orders"):
        if os.path.isdir(JOIN_DIR):
            shutil.rmtree(JOIN_DIR)
        os.makedirs(JOIN_DIR)
        # facts: shift ONLY the row-identity key; the FK column stays
        # verbatim so the 100x facts fan out over the 1x dimension
        _replicate_shifted(
            spark, "orders", ["o_orderkey"], f"{JOIN_DIR}/orders.parquet"
        )
        os.symlink(f"{SRC}/customer.parquet", f"{JOIN_DIR}/customer.parquet")
        os.symlink(f"{SRC}/nation.parquet", f"{JOIN_DIR}/nation.parquet")
        print(f"built {JOIN_DIR}", file=sys.stderr)
    else:
        print(f"kept {JOIN_DIR}", file=sys.stderr)
    # dirs built by the pre-r16 recipe lack the nation dimension
    # (q_representation_parity's scale run needs it); heal in place.
    # lexists, not exists: a DANGLING symlink (testdata remounted) must
    # be replaced, and exists() would report it absent then symlink()
    # would raise FileExistsError over the stale link.
    nation_link = f"{JOIN_DIR}/nation.parquet"
    if os.path.lexists(nation_link) and not os.path.exists(nation_link):
        os.unlink(nation_link)
    if not os.path.lexists(nation_link):
        os.symlink(f"{SRC}/nation.parquet", nation_link)

    # after any (re)materialization: the id-uniqueness sanity check the
    # verify skill mandates before trusting numbers from a corpus
    for path, table, key in (
        (FAMILY_DIR, "documents", "doc_id"),
        (FAMILY_DIR, "embeddings", "vec_id"),
        (EVENTS_DIR, "events", "event_id"),
        (ORDERS_DIR, "orders", "o_orderkey"),
        (JOIN_DIR, "orders", "o_orderkey"),
    ):
        df = spark.read.parquet(f"{path}/{table}.parquet")
        n, d = df.count(), df.select(key).distinct().count()
        status = "OK" if n == d else "DUPLICATE-ID VIOLATION"
        print(f"{path}/{table}: rows={n} distinct({key})={d} {status}", flush=True)
        if n != d:
            sys.exit(1)

    # FK sanity for the join corpus (the r10 ADVICE failure mode):
    # every 100x fact must still hit the 1x dimension, or join output
    # stops scaling with the facts and the corpus measures nothing
    ords = spark.read.parquet(f"{JOIN_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{JOIN_DIR}/customer.parquet")
    n_orphan = ords.join(
        cust.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    ).count()
    status = "OK" if n_orphan == 0 else "FK VIOLATION"
    print(f"{JOIN_DIR}: orphan facts={n_orphan} {status}", flush=True)
    if n_orphan:
        sys.exit(1)

    spark.stop()


if __name__ == "__main__":
    main()
