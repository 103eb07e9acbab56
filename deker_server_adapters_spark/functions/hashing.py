"""Portable hash primitives.

Everything here evaluates to the SAME value in Spark SQL and DuckDB, so
hash-based operators (minhash/LSH, simhash, consistent-hash ring,
fingerprints) can be verified against a DuckDB oracle bit-for-bit.

The primitive is an md5-prefix integer: ``h32(s) = int(md5(s)[:8], 16)``,
a uniform 32-bit value. Spark: ``conv(substr(md5(s),1,8),16,10)`` (all
JVM-side, whole-stage-codegen friendly — no Python UDF). DuckDB:
``CAST('0x' || substr(md5(s),1,8) AS UBIGINT)``.

At 100 TB scale these stay in codegen and cost one md5 per row per seed;
for K minhash permutations we hash K seeded variants rather than
permuting, the standard trick (Broder 1997).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column, seed: int | str = 0) -> Column:
    """Uniform 32-bit integer hash, identical in Spark and DuckDB."""
    keyed = F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB-SQL twin of :func:`h32`."""
    return f"CAST('0x' || substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 1, 8) AS UBIGINT)"


def h64(col: Column, seed: int | str = 0) -> Column:
    """Uniform 60-bit integer hash (15 hex digits — skips the top
    nibble so the value stays non-negative in both engines' BIGINT)."""
    keyed = F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 2, 15), 16, 10).cast("long")


def h64_sql(expr: str, seed: int | str = 0) -> str:
    return f"CAST('0x' || substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 2, 15) AS BIGINT)"
