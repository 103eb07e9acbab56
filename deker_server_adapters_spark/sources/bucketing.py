"""Bucketed tables: pre-shuffled storage for co-located joins.

Writing both sides of a hot join bucketed (and sorted) by the join key
means Spark reads matching buckets pairwise — the join runs with NO
exchange at query time. On a 100 TB fact table joined every hour,
this moves the shuffle from every-query to once-at-ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)  # managed table under the warehouse dir
    )


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
