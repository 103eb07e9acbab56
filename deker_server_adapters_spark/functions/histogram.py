"""Shared bounded-state histogram-quantile device (r9).

One implementation of the equi-width-histogram quantile estimator used
across the registry — grouped or global — so the estimator's
arithmetic (bin clamp, mx==mn guard, in-bin rank interpolation) lives
in exactly one Spark code path and one DuckDB SQL generator instead of
a copy per operator. The device itself is proven by
``events_value_histogram_quantiles`` (operators/events.py), which
keeps its own standalone form because it additionally evaluates the
estimator against the exact quantile; the four r9 consumers
(``customer_rfm_segments``, ``nation_order_value_quantiles``,
``customer_spend_migration``, ``events_session_duration_quantiles``)
all route through here.

Contract: input is (group_cols..., v DOUBLE); output is
(group_cols..., q, n, est) where ``n`` is the group's row count as
DOUBLE and ``est`` is the UNROUNDED interpolated quantile — callers
apply their own final rounding so existing per-op conventions (9 dp
boundaries, 6 dp metrics, /1e6 unit conversion) stay byte-identical.
Estimator error ≤ 2 bin widths of the group's value range plus the
bracketing order-stat gap (pinned by the estimator tests). Aggregate
state is ≤ groups × bins count rows; the cumulative window runs over
≤ bins rows per group partition.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def round_ties_safe(col: Union[Column, str], digits: int) -> Column:
    """Cross-engine tie-safe fixed-point rounding: floor(x·10^d + 0.5)
    / 10^d expressed as plain IEEE double ops, so Spark and DuckDB
    produce the bit-identical result whenever the unrounded input is
    bit-identical.

    Why not ``F.round``: Spark's round(double, d) goes through
    BigDecimal HALF_UP on the shortest decimal rendering while DuckDB
    scales the binary double, so a value whose rendering terminates in
    ``…5`` at digit d+1 (money-grid inputs through the histogram
    device hit this) rounds differently — the exact r9
    ``nation_order_value_quantiles`` failure (NATION_12 median
    265367.6184375: Spark …438 vs DuckDB …437). This expression is the
    same three IEEE ops in both engines, so ties cannot diverge.
    Halves round toward +inf (not away from zero) for negatives —
    irrelevant for parity, documented for consumers. Valid while
    |x|·10^d < 2^53 (Spark's floor(double) yields BIGINT, exactly
    representable back as double in that range).

    Pair with :func:`round_ties_safe_sql` in the oracle SQL.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**digits))
    return F.floor(c * scale + F.lit(0.5)) / scale


def round_ties_safe_sql(expr: str, digits: int) -> str:
    """SQL fragment mirroring :func:`round_ties_safe` bit-for-bit:
    ``floor((expr) * 10^d + 0.5) / 10^d``. The scale is spelled in
    exponent notation (``1e4``) because that parses as DOUBLE in BOTH
    DuckDB and Spark SQL, while ``10000.0`` parses as DECIMAL in Spark
    SQL — and ``floor(double)`` is BIGINT there, so a decimal scale
    would turn the division into decimal arithmetic and change the
    output type (the fragment is valid in both dialects, so oracles
    and ``F.expr`` call sites share it)."""
    scale = f"1e{digits}"
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def grouped_hist_quantile_estimates(
    spark: SparkSession,
    df: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    bins: int,
) -> DataFrame:
    g = list(group_cols)
    mm = df.groupBy(*g).agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count("*").cast("double").alias("n"),
    )
    joined = df.join(F.broadcast(mm), g) if g else df.crossJoin(F.broadcast(mm))
    binned = joined.select(
        *g,
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * bins
                ),
            )
        )
        .cast("int")
        .alias("bin"),
    )
    hist = binned.groupBy(*g, "bin").agg(F.count("*").alias("cnt"))
    cum = hist.select(
        *g,
        "bin",
        "cnt",
        F.sum("cnt").over(Window.partitionBy(*g).orderBy("bin")).alias("cum"),
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    withq = cum.crossJoin(F.broadcast(qdf))
    withq = withq.join(F.broadcast(mm), g) if g else withq.crossJoin(F.broadcast(mm))
    return (
        withq.filter(F.col("cum") >= F.col("q") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy(*g, "q").orderBy("bin")),
        )
        .filter(F.col("rn") == 1)
        .select(
            *g,
            "q",
            "n",
            (
                F.col("mn")
                + (
                    F.col("bin")
                    + (F.col("q") * F.col("n") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt")
                )
                * ((F.col("mx") - F.col("mn")) / F.lit(float(bins)))
            ).alias("est"),
        )
    )


def hist_quantile_sql_ctes(
    src: str, group_cols: Sequence[str], qs: Sequence[float], bins: int
) -> str:
    """DuckDB WITH-fragment mirroring ``grouped_hist_quantile_estimates``
    bit-for-bit. Expects an earlier CTE named ``src`` with columns
    (group_cols..., v); ends with CTE ``hqest(group_cols..., q, n,
    est)``. Append after an existing CTE list with a leading comma."""
    g = list(group_cols)
    gsel = "".join(f"{c}, " for c in g)
    gby = ", ".join(g)
    mm_join = (
        "JOIN hqmm m ON " + " AND ".join(f"p.{c} = m.{c}" for c in g)
        if g
        else "CROSS JOIN hqmm m"
    )
    est_join = (
        "JOIN hqmm m ON " + " AND ".join(f"c.{c} = m.{c}" for c in g)
        if g
        else "CROSS JOIN hqmm m"
    )
    part_g = f"PARTITION BY {gby} " if g else ""
    csel = "".join(f"c.{c}, " for c in g)
    qlist = ", ".join(str(float(q)) for q in qs)
    return f"""hqmm AS (
  SELECT {gsel}min(v) AS mn, max(v) AS mx, CAST(count(*) AS DOUBLE) AS n
  FROM {src}{f" GROUP BY {gby}" if g else ""}
),
hqbinned AS (
  SELECT {"".join(f"p.{c}, " for c in g)}CASE WHEN m.mx = m.mn THEN 0
              ELSE CAST(least({bins - 1}, floor((p.v - m.mn) / (m.mx - m.mn) * {bins})) AS INT) END AS bin
  FROM {src} p {mm_join}
),
hqhist AS (SELECT {gsel}bin, count(*) AS cnt FROM hqbinned GROUP BY {gsel}bin),
hqcum AS (
  SELECT {gsel}bin, cnt, sum(cnt) OVER ({part_g}ORDER BY bin) AS cum FROM hqhist
),
hqqs AS (SELECT unnest([{qlist}]) AS q),
hqest AS (
  SELECT {gsel}q, n,
         mn + (bin + (q * n - (cum - cnt)) / cnt) * ((mx - mn) / {float(bins)}) AS est
  FROM (
    SELECT {csel}s.q, c.bin, c.cnt, c.cum, m.n, m.mn, m.mx,
           row_number() OVER (PARTITION BY {csel}s.q ORDER BY c.bin) AS rn
    FROM hqcum c CROSS JOIN hqqs s {est_join}
    WHERE c.cum >= s.q * m.n
  ) t WHERE rn = 1
)"""
