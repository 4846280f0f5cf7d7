"""Engine-portable deterministic hashing primitives.

Everything here must be computable bit-identically by the DuckDB oracle, so
we build on md5 (available in both engines) rather than xxhash64 (Spark-only)
or hash() (DuckDB-only, different algorithm).

All arithmetic stays inside signed 64-bit range so Spark (Java long) and
DuckDB (BIGINT) agree exactly:
  * hash60: 60-bit nonneg integer from the first 15 hex chars of md5;
  * permuted minhash: (a * (h mod 2^31) + b) mod P with a < 2^31 and
    b < P = 2^61-1  =>  a*h31 < 2^62, sum < 2^63: no overflow either side.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1
MOD31 = 1 << 31
N_PERM = 64

_rng = random.Random(42)
PERM_A: list[int] = [_rng.randrange(1, MOD31) for _ in range(N_PERM)]
PERM_B: list[int] = [_rng.randrange(0, MERSENNE61) for _ in range(N_PERM)]


def hash60(col: Column) -> Column:
    """60-bit nonnegative deterministic hash of a string column (JVM-side:
    md5 + base-16 conv; DuckDB mirror: ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """The DuckDB-side expression mirroring :func:`hash60`."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def perm_hash(h: Column, i: int) -> Column:
    """i-th universal-hash permutation of a hash60 value (minhash family)."""
    return (F.lit(PERM_A[i]) * (h % F.lit(MOD31)) + F.lit(PERM_B[i])) % F.lit(MERSENNE61)


def perm_hash_sql(h_expr: str, i: int) -> str:
    return f"(({PERM_A[i]} * (({h_expr}) % {MOD31}) + {PERM_B[i]}) % {MERSENNE61})"


def sentinel_digest(*cols: Column) -> Column:
    """md5 over \\x1f-joined, \\x00-NULL-sentineled string columns — the
    cross-engine payload-digest discipline (q_duplicate_payloads):
    concat_ws would silently DROP a NULL field and its separator
    (DuckDB's || would instead NULL the whole digest) — both a
    cross-engine divergence and a collision hazard, and '' as the
    sentinel would collide NULL with empty. One definition so every
    digest caller (batch queries, staged tranches, oracles via
    :func:`sentinel_digest_sql`) stays byte-identical."""
    return F.md5(
        F.concat_ws("\x1f", *[F.coalesce(c, F.lit("\x00")) for c in cols])
    )


def sentinel_digest_sql(*exprs: str) -> str:
    """The DuckDB expression mirroring :func:`sentinel_digest`."""
    joined = " || chr(31) || ".join(f"COALESCE({e}, chr(0))" for e in exprs)
    return f"md5({joined})"
