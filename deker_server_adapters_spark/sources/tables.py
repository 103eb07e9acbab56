"""Test-table registry.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table under
``/root/testdata/sf*/``. We always load via ``spark.read.parquet`` so
Catalyst gets a real file-source relation (predicate pushdown, column
pruning, partition-level stats) rather than an in-memory scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DuckDB FROM-clause twin of the events nanos→micros truncation.
EVENTS_DUCK = "(SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events) events"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamp semantics must not depend on the caller's session TZ
    # (DuckDB oracle timestamps are naive): pin to UTC so date_trunc /
    # year() / pandas conversion agree on any driver session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet has shipped with three physical ts encodings
        # across driver data regenerations: TIMESTAMP(NANOS),
        # TIMESTAMP(MICROS) without timezone, and TIMESTAMP(MICROS)
        # adjusted-to-UTC. Normalize ALL of them to TIMESTAMP_LTZ at
        # the scan so every downstream expression (unix_micros, window,
        # date_trunc) sees one type:
        # - nanosAsLong reads nanos as raw int64; truncate to micros
        #   (integer DIV — exact). Oracle SQL applies the identical
        #   truncation so both engines see the same instants.
        # - inferTimestampNTZ=false makes a no-timezone micros column
        #   read as TIMESTAMP_LTZ directly at the file scan (session TZ
        #   pinned UTC above, so the instant is deterministic) instead
        #   of TIMESTAMP_NTZ — no post-scan cast, so ts predicates
        #   still push down to parquet.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":  # nanos file; micros copies read clean
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can see them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
