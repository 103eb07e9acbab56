"""Data-layout utilities: Z-order (Morton) clustering.

A parquet lake prunes on per-file min/max stats. Range-partitioning by
ONE column gives perfect locality on that column and none on any
other; interleaving the bits of several columns (Z-order) gives every
listed column partial locality, so predicates on ANY of them skip most
files. This is the layout move behind Delta's OPTIMIZE ZORDER BY and
Iceberg's sort orders, expressed with plain Catalyst bit arithmetic —
no UDFs, stays in whole-stage codegen.

Scale shape: per-column min/max come from ONE aggregate (a scalar row
broadcast into the expression); the z-value is 32 bitwise ops per row;
the layout itself is a single repartitionByRange + sortWithinPartitions
— exactly one shuffle, the same cost as any other re-layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-column resolution; 2 cols * 16 bits = 32-bit z-value


def _rank16(col: Column, lo: float | None, hi: float | None) -> Column:
    """Normalize a numeric column to a 16-bit integer rank via the
    broadcast [lo, hi] range (degenerate or unknown range — empty
    input, all-NULL column — -> rank 0)."""
    if lo is None or hi is None or hi <= lo:
        return F.lit(0)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * ((1 << _BITS) - 1)).cast("long")


def zvalue(ranks: list[Column]) -> Column:
    """Interleave the low 16 bits of each rank column (Morton code)."""
    n = len(ranks)
    z = F.lit(0).cast("long")
    for b in range(_BITS):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_layout(df: DataFrame, cols: list[str], n_partitions: int) -> DataFrame:
    """Re-layout ``df`` so files/partitions are clustered on the
    Z-curve over ``cols``: one stats aggregate, one range shuffle.
    Write the result with ``write.parquet`` and every listed column's
    min/max tightens per file."""
    stats_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}_lo") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"{c}_hi") for c in cols],
    ).first()
    ranks = [
        _rank16(F.col(c), stats_row[f"{c}_lo"], stats_row[f"{c}_hi"]) for c in cols
    ]
    z = zvalue(ranks).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compaction_plan(
    input_dir: str, target_file_bytes: int = 256 * 1024 * 1024
) -> tuple[int, int, int]:
    """Small-file compaction sizing: (n_files, total_bytes,
    target_partitions) for a parquet dataset directory.

    The 100 TB operational problem this serves: streaming ingest and
    per-chunk writes leave datasets with thousands of KB-scale files;
    every query then pays per-file open/footer costs and the scheduler
    pays per-split overhead. Target partitions = ceil(total/target) so
    the rewrite lands near the target file size (parquet encoding
    usually shrinks the on-disk result further — callers who need
    exact sizing should measure the input's encoded density, not
    assume raw bytes)."""
    import os

    n_files = 0
    total = 0
    for root, _dirs, files in os.walk(input_dir):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                total += os.path.getsize(os.path.join(root, f))
    target_parts = max(1, -(-total // target_file_bytes))
    return n_files, total, int(target_parts)


def compact_files(
    spark,
    input_dir: str,
    output_dir: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Rewrite a many-small-files parquet dataset into about
    ``ceil(total_bytes/target)`` files. ``coalesce`` (not
    ``repartition``): compaction must not pay a shuffle — tasks just
    concatenate input splits, so the rewrite cost is one read + one
    write of the data.

    Returns the partition count actually used: ``coalesce`` can only
    REDUCE partition count, so the plan's target is clamped to the
    scan's split count (a target above it would silently write fewer,
    larger files than reported). Sizing uses compressed on-disk input
    bytes, so output files can land above ``target_file_bytes`` when
    re-encoding compresses worse than the input — callers needing
    exact sizes should measure encoded density (see
    ``compaction_plan``)."""
    _n, _total, parts = compaction_plan(input_dir, target_file_bytes)
    df = spark.read.parquet(input_dir)
    parts = min(parts, df.rdd.getNumPartitions())
    df.coalesce(parts).write.mode("overwrite").parquet(output_dir)
    return parts
