"""Local emulation of the driver's DuckDB-oracle compare.

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet directory, then compares row count, sorted column names, and an
order-insensitive exact value multiset. Used by tests/test_oracle_parity.py
so parity failures surface locally before the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return v


def _rows_to_multiset(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    result: dict[str, Any] = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    result["count_match"] = len(s_rows) == len(d_rows)
    result["schema_match"] = sorted(s_cols) == sorted(d_cols)
    if result["count_match"] and result["schema_match"]:
        ms, md = _rows_to_multiset(s_rows, s_cols), _rows_to_multiset(d_rows, d_cols)
        result["value_match"] = ms == md
        if not result["value_match"]:
            diff = [(a, b) for a, b in zip(ms, md) if a != b][:5]
            result["first_diffs"] = diff
    else:
        result["value_match"] = False
    result["ok"] = result["count_match"] and result["schema_match"] and result["value_match"]
    return result
