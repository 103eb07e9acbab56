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
