"""Skew-mitigation utilities: salted joins/aggregations for hot keys.

AQE's skew-join handling (enabled in session.py) covers most cases at
runtime; these explicit forms are for the pathological ones — a
handful of keys carrying a double-digit percentage of a 100 TB fact
table — where you decide the salt factor from known key stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big table against a small table by salting:
    the big side gets a deterministic salt in [0, salt_n) (hash of the
    whole row — spreads a hot key over salt_n reducers), the small
    side is replicated salt_n times. Result == plain join, shuffle
    skew / salt_n.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_key: str, distinct_col: str, salt_n: int = 16
) -> DataFrame:
    """Two-phase exact distinct count for a skewed group key: phase 1
    dedupes (key, value) within (key, salt) partitions, phase 2 merges
    per-salt partial distincts. Equivalent to
    groupBy(key).countDistinct(col) with the hot key spread salt_n ways.
    """
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(salt_n))
    phase1 = (
        df.select(group_key, distinct_col)
        .withColumn("__salt", salt)
        .groupBy(group_key, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    # values are routed to salts by their own hash, so per-salt distinct
    # sets are disjoint and partials add up exactly
    return phase1.groupBy(group_key).agg(F.sum("__partial").alias("n_distinct"))
