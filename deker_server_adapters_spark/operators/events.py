"""Temporal / event-stream operators (batch forms).

Streaming twins live in ``streaming/`` — these batch forms are what the
DuckDB oracle can verify, and they share the same window semantics.

Scale notes: every window is partitioned by ``user_id`` (high
cardinality → even shuffle); the as-of join is the union-window trick
(one shuffle, no range-join explosion) — the standard way to make as-of
joins scale to billions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deker_server_adapters_spark.operators import Op
from deker_server_adapters_spark.functions.histogram import (
    grouped_hist_quantile_estimates,
    hist_quantile_sql_ctes,
    round_ties_safe,
    round_ties_safe_sql,
)
from deker_server_adapters_spark.sources.tables import EVENTS_DUCK, load_table


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2).cast("double").alias("sum_value"),
        )
    )


TUMBLING_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_value
FROM {EVENTS_DUCK}
GROUP BY window_start, event_type
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-minute silence starts a new session."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    with_flag = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    )
    with_sid = with_flag.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2).cast("double").alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


SESSION_SQL = f"""
WITH flagged AS (
  SELECT *,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM {EVENTS_DUCK}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS session_value,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess
GROUP BY user_id, session_id
"""


def events_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum(F.col("value").cast("decimal(30,6)")).over(w), 2).cast("double").alias("running_value"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("event_seq"),
    )


RUNNING_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(round(sum(CAST(value AS DECIMAL(30,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS event_seq
FROM {EVENTS_DUCK}
"""


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each ``error`` event, the value of the same user's most recent
    strictly-prior ``purchase``.

    Implemented as a single ordered window over the union (the
    'last non-null before me' trick) instead of a range join — one
    shuffle on user_id, linear scan per partition, no pair blowup.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        ev.withColumn("last_purchase_value", F.last(purchase_val, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "value", "last_purchase_value")
    )


ASOF_SQL = f"""
SELECT event_id, user_id, ts, value, last_purchase_value
FROM (
  SELECT *,
         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_value
  FROM {EVENTS_DUCK}
) t
WHERE event_type = 'error'
"""


def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2).cast("double").alias("purchase_volume"),
        )
        .orderBy(F.desc("purchase_volume"), "user_id")
        .limit(10)
    )


TOP_USERS_SQL = f"""
SELECT user_id, count(*) AS n_purchases, CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS purchase_volume
FROM {EVENTS_DUCK}
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY purchase_volume DESC, user_id
LIMIT 10
"""


def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per type — the sketch that
    replaces exact quantiles at 100 TB (mergeable, single pass, bounded
    memory). Rows-only; error vs exact is pytest-bounded."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.9), 1000)").alias("approx_p50_p90")
    ).select(
        "event_type",
        F.col("approx_p50_p90")[0].alias("p50"),
        F.col("approx_p50_p90")[1].alias("p90"),
    )


def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per (user, type) — the compaction/upsert-view
    pattern (row_number over ts desc, keep 1)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


LATEST_SQL = f"""
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM {EVENTS_DUCK}
) t
WHERE rn = 1
"""


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: extract the JSON ``props.k`` field and
    aggregate over it (JVM-side get_json_object; no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            "event_type",
            "value",
        )
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2).cast("double").alias("sum_value"),
        )
    )


PROPS_JSON_SQL = f"""
SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_value
FROM {EVENTS_DUCK}
GROUP BY event_type, k_mod
"""


def events_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day+type (the shuffle-dedup pattern;
    at 100 TB you'd flip count_distinct -> approx_count_distinct and
    lose the oracle, so the exact form is what's value-checked)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


DISTINCT_USERS_SQL = f"""
SELECT date_trunc('day', ts) AS day, event_type, count(DISTINCT user_id) AS n_users
FROM {EVENTS_DUCK}
GROUP BY day, event_type
"""


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated median + p90 of value per event type (Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the continuous
    quantile definition)."""
    ev = load_table(spark, sf_dir, "events")
    # Interpolated quantile = (1-f)*a + f*b: a non-dyadic double, the r9
    # red-row hazard class — tie-safe rounding, never engine-native.
    return ev.groupBy("event_type").agg(
        round_ties_safe(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        round_ties_safe(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
    )


PERCENTILES_SQL = f"""
SELECT event_type,
       {round_ties_safe_sql("quantile_cont(value, 0.5)", 4)} AS p50,
       {round_ties_safe_sql("quantile_cont(value, 0.9)", 4)} AS p90
FROM {EVENTS_DUCK}
GROUP BY event_type
"""


def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum/count over event time, inclusive
    frame [t-1h, t] with RANGE (peer-sharing) semantics.

    NOT a sliding RANGE window: Spark's sliding-frame executor replays
    the whole frame per row (O(n * frame)), which turns a hot user into
    a quadratic straggler — measured 8.3x at 10x data with one user
    owning 10% of events, vs 2.3x uniform (stress.py --skew). This is
    the O(n) difference-of-prefix-sums form instead:

    1. pre-aggregate per (user_id, ts-micros) — exact decimal partial
       sums, and afterwards each user has ONE row per distinct ts, so
       running frames have no peer subtleties;
    2. union a zero-valued PROBE row per distinct ts keyed at
       t - 1h (sorted before any real row tied at the same key, so a
       probe sums rows strictly below the frame start);
    3. ONE running ROWS cumsum (unbounded-preceding frames are
       incremental in Spark — O(n) total, skew cost linear) gives the
       inclusive prefix at real rows and the pre-frame prefix at
       probes;
    4. rolling = real-prefix - probe-prefix (exact: decimal
       accumulation has no float cancellation), joined back to events
       on (user_id, ts-micros).

    The DuckDB oracle keeps the plain sliding window — the single-node
    luxury — and values match exactly."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("tus"), "value"
    )
    g = e.groupBy("user_id", "tus").agg(
        F.sum(F.col("value").cast("decimal(30,6)")).alias("v"),
        F.count("*").alias("c"),
    )
    reals = g.select(
        "user_id", F.col("tus").alias("k"), F.lit(1).alias("flag"), "tus", "v", "c"
    )
    probes = g.select(
        "user_id",
        (F.col("tus") - F.lit(3_600_000_000)).alias("k"),
        F.lit(0).alias("flag"),
        "tus",
        F.lit(0).cast("decimal(30,6)").alias("v"),
        F.lit(0).cast("long").alias("c"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("k", "flag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = reals.unionByName(probes).select(
        "user_id",
        "flag",
        "tus",
        F.sum("v").over(w_run).alias("runv"),
        F.sum("c").over(w_run).alias("runc"),
    )
    pre = u.filter(F.col("flag") == 0).select(
        "user_id", "tus", F.col("runv").alias("pv"), F.col("runc").alias("pc")
    )
    incl = u.filter(F.col("flag") == 1).select("user_id", "tus", "runv", "runc")
    roll = incl.join(pre, ["user_id", "tus"]).select(
        "user_id",
        "tus",
        (F.col("runv") - F.col("pv")).alias("rv"),
        (F.col("runc") - F.col("pc")).alias("rc"),
    )
    return e.join(roll, ["user_id", "tus"]).select(
        "event_id",
        "user_id",
        "ts",
        # native-round-ok: rv is DECIMAL(30,6) (difference of decimal
        # running sums) — base-10-exact, both engines HALF_UP identically
        F.round("rv", 2).cast("double").alias("rolling_1h_value"),
        F.col("rc").alias("rolling_1h_events"),
    )


ROLLING_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(round(sum(CAST(value AS DECIMAL(30,6))) OVER w, 2) AS DOUBLE) AS rolling_1h_value,
       count(*) OVER w AS rolling_1h_events
FROM {EVENTS_DUCK}
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts pivoted to one column per event type (explicit
    pivot values — a wildcard pivot would need an extra distinct scan)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


def events_melt_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip: the wide per-day type-count matrix
    melted back to long form with Spark's native ``unpivot`` (the
    wide-table ingestion pattern — metrics exports and spreadsheets
    arrive wide; the melt is a zero-shuffle map-side Expand). Zero
    cells survive the round trip (the pivot filled them), so the long
    form is the full day x type grid — the oracle builds the same grid
    with a conditional aggregate."""
    wide = events_pivot_types(spark, sf_dir)
    return wide.unpivot("day", list(_EVENT_TYPES), "event_type", "n_events")


MELT_SQL = f"""
SELECT date_trunc('day', ts_all.day) AS day, t.event_type,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM {{ev}}) ts_all
CROSS JOIN (SELECT unnest([{", ".join(repr(t) for t in _EVENT_TYPES)}]) AS event_type) t
LEFT JOIN (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM {{ev}} GROUP BY day, event_type
) c ON c.day = ts_all.day AND c.event_type = t.event_type
"""


_PIVOT_COLS = ",\n       ".join(
    f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
    for t in _EVENT_TYPES
)

PIVOT_SQL = f"""
SELECT date_trunc('day', ts) AS day,
       {_PIVOT_COLS}
FROM {EVENTS_DUCK}
GROUP BY day
"""


# Count-min sketch geometry: depth x width counters, portable md5-based
# row hashes (same affine-over-md5 scheme the minhash family uses, so
# DuckDB mirrors the sketch bit-for-bit).
_CMS_D = 5
_CMS_W = 8192
_CMS_P = 2147483647
_CMS_A = (769, 1543, 3079, 6151, 12289)
_CMS_B = (7, 131, 523, 2053, 8209)
_CMS_SAMPLE_PCT = 2  # deterministic candidate sample: md5(event_id) % 100 < 2
_H32 = "CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
_CMS_BUCKETS = ", ".join(
    f"(({a} * h + {b}) % {_CMS_P}) % {_CMS_W}" for a, b in zip(_CMS_A, _CMS_B)
)


def heavy_hitters_cms_df(ev: DataFrame) -> DataFrame:
    """Heavy-hitter frequencies via a count-min sketch, end-to-end in
    DataFrame ops (no JVM sketch object, so it runs under Spark Connect
    and has an exact DuckDB oracle).

    The sketch IS an aggregation: one md5 per event, D affine bucket
    ids, posexplode, groupBy (j, bucket) — map-side partial aggregation
    bounds the shuffle at D*W rows per task, so the merged sketch is a
    <=D*W-row table (a few hundred KB) no matter how many events went
    in; partial sketches combine associatively exactly like the
    classic byte-array form. Candidates come from a DETERMINISTIC 2%
    event sample (md5 gate on event_id), never an exact corpus-wide
    top-k groupBy — at 100 TB the exact top-k is the cost the sketch
    exists to avoid (r5 verdict item 6). Probing is a broadcast of
    10*D probe rows joined against the sketch table + a min per key:
    O(k*D) regardless of N. CMS never underestimates; the error bound
    vs exact counts is pytest-checked."""
    hu = _H32.format(col="user_id")
    sketch = (
        ev.select(F.expr(hu).alias("h"))
        .select(F.posexplode(F.expr(f"array({_CMS_BUCKETS})")).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    cand = (
        ev.filter(F.expr(f"{_H32.format(col='event_id')} % 100 < {_CMS_SAMPLE_PCT}"))
        .groupBy("user_id")
        .agg(F.count("*").alias("sample_n"))
        .orderBy(F.desc("sample_n"), "user_id")
        .limit(10)
    )
    probes = cand.select("user_id", "sample_n", F.expr(hu).alias("h")).select(
        "user_id",
        "sample_n",
        F.posexplode(F.expr(f"array({_CMS_BUCKETS})")).alias("j", "bucket"),
    )
    return (
        F.broadcast(probes)
        .join(sketch, ["j", "bucket"])
        .groupBy("user_id", "sample_n")
        .agg(F.min("cnt").alias("cms_estimate"))
        .orderBy(F.desc("sample_n"), "user_id")
    )


def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters_cms_df(load_table(spark, sf_dir, "events"))


_CMS_SEEDS_VALUES = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(zip(_CMS_A, _CMS_B))
)
_H32_DUCK = (
    "CAST(CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT)"
)

CMS_SQL = f"""
WITH seeds(j, a, b) AS (VALUES {_CMS_SEEDS_VALUES}),
h AS (
  SELECT {_H32_DUCK.format(col='user_id')} AS h FROM events
), sk AS (
  SELECT s.j, ((s.a * h.h + s.b) % {_CMS_P}) % {_CMS_W} AS bucket,
         count(*) AS cnt
  FROM h CROSS JOIN seeds s
  GROUP BY 1, 2
), cand AS (
  SELECT user_id, count(*) AS sample_n FROM events
  WHERE {_H32_DUCK.format(col='event_id')} % 100 < {_CMS_SAMPLE_PCT}
  GROUP BY user_id
  ORDER BY sample_n DESC, user_id
  LIMIT 10
), probes AS (
  SELECT c.user_id, c.sample_n, s.j,
         ((s.a * {_H32_DUCK.format(col='c.user_id')} + s.b) % {_CMS_P}) % {_CMS_W}
             AS bucket
  FROM cand c CROSS JOIN seeds s
)
SELECT p.user_id, p.sample_n, CAST(min(sk.cnt) AS BIGINT) AS cms_estimate
FROM probes p JOIN sk ON sk.j = p.j AND sk.bucket = p.bucket
GROUP BY p.user_id, p.sample_n
"""


def events_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per type — the sketch that replaces exact
    distinct at 100 TB (no oracle: sketch estimates are engine-
    specific; the error bound vs exact is pytest-checked)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


def funnel_df(ev: DataFrame) -> DataFrame:
    """Ordered funnel click -> view -> purchase: a user advances a
    stage only with a LATER event of the next type (strict event-time
    order, not mere co-occurrence).

    Single-shuffle shape: ONE scan of events, ONE hash-partition by
    user_id, three stacked window-mins over that same partitioning
    (each stage's threshold references the previous stage's column, so
    no joins and no re-scan per stage — the naive form re-filters the
    base table once per stage and equi-joins the chain). A missing
    earlier stage makes the threshold NULL, which nulls the comparison
    and so the later stage — inner-join semantics for free. No
    event-list collection: windows carry one timestamp per row."""
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "view") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    # t1-t3 are per-user constants, so one row per user falls out of a
    # groupBy on the user_id partitioning the windows already
    # established — Catalyst collapses it onto the same exchange. A
    # .distinct() over (user_id, t1, t2, t3) would re-shuffle on all
    # four columns instead.
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return counts.selectExpr(
        "stack(3, 'click', n1, 'click>view', n2, 'click>view>purchase', n3) "
        "AS (stage, n_users)"
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_df(load_table(spark, sf_dir, "events"))


FUNNEL_SQL = f"""
WITH ev AS (SELECT * FROM {EVENTS_DUCK}),
c AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'click' GROUP BY user_id),
v AS (SELECT ev.user_id, min(ev.ts) AS t2 FROM ev JOIN c ON ev.user_id = c.user_id
      WHERE ev.event_type = 'view' AND ev.ts > c.t1 GROUP BY ev.user_id),
p AS (SELECT ev.user_id, min(ev.ts) AS t3 FROM ev JOIN v ON ev.user_id = v.user_id
      WHERE ev.event_type = 'purchase' AND ev.ts > v.t2 GROUP BY ev.user_id)
SELECT 'click' AS stage, count(*) AS n_users FROM c
UNION ALL SELECT 'click>view', count(*) FROM v
UNION ALL SELECT 'click>view>purchase', count(*) FROM p
"""


def retention_df(ev: DataFrame) -> DataFrame:
    """Day-N retention cohorts: cohort = a user's first active day;
    for N in 0..7 count users active again N days later. Activity is
    deduped to (user, day) FIRST so later stages fan out over
    active-days, never raw events; the cohort day is a window-min over
    the same rows — no self-join, no second scan of the events table
    (a join of act against groupBy(act) plans the distinct twice:
    DataFrames get no cross-branch subplan reuse)."""
    act = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    return (
        act.withColumn("cohort_day", F.min("day").over(w))
        .withColumn("day_n", F.datediff("day", "cohort_day").cast("long"))
        .filter(F.col("day_n") <= 7)
        .groupBy("cohort_day", "day_n")
        .agg(F.count("*").alias("n_users"))
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_df(load_table(spark, sf_dir, "events"))


RETENTION_SQL = f"""
WITH ev AS (SELECT * FROM {EVENTS_DUCK}),
act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
first AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
SELECT first.cohort_day, datediff('day', first.cohort_day, act.day) AS day_n,
       count(*) AS n_users
FROM act JOIN first ON act.user_id = first.user_id
WHERE datediff('day', first.cohort_day, act.day) <= 7
GROUP BY first.cohort_day, day_n
"""


def anomaly_stats_df(ev: DataFrame) -> DataFrame:
    """Per-type (mean, std) from DECIMAL sums (sum, sum of squares) so
    both engines compute bit-identical moments — stddev_samp
    implementations differ (Welford vs sum-of-squares) and would
    jitter the last float bits across engines, flipping rounded z at
    boundaries. Degenerate groups are NULLed, not divided: n=1 has no
    sample variance (nullif(n-1)) and float rounding can push the
    zero-variance numerator epsilon-negative (greatest 0) — under
    Spark's default ANSI mode a bare division would abort the query
    with DIVIDE_BY_ZERO where DuckDB yields NULL."""
    dec = F.col("value").cast("decimal(30,6)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).alias("s1"),
            F.sum(dec * dec).alias("s2"),
        )
        .select(
            "event_type",
            "n",
            (F.col("s1").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                F.greatest(
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n"),
                    F.lit(0.0),
                )
                / F.nullif(F.col("n") - 1, F.lit(0))
            ).alias("std"),
        )
    )


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3). The stats table is 5 rows,
    broadcast back onto the stream: a window over
    partitionBy(event_type) would squeeze 100 TB through 5 tasks.
    std=0 or n=1 groups yield NULL z (nullif) and are filtered —
    matching the oracle, where double/0 is NULL."""
    ev = load_table(spark, sf_dir, "events")
    stats = anomaly_stats_df(ev)
    z = (F.col("value") - F.col("mean")) / F.nullif(F.col("std"), F.lit(0.0))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", round_ties_safe(z, 2))
        .filter(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", "value", "z")
    )


ANOMALY_SQL = f"""
WITH ev AS (SELECT * FROM {EVENTS_DUCK}),
stats AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(value AS DECIMAL(30,6))) AS s1,
         sum(CAST(value AS DECIMAL(30,6)) * CAST(value AS DECIMAL(30,6))) AS s2
  FROM ev GROUP BY event_type
), m AS (
  SELECT event_type,
         CAST(s1 AS DOUBLE) / n AS mean,
         sqrt(greatest(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n, 0.0)
              / nullif(n - 1, 0)) AS std
  FROM stats
)
SELECT ev.event_id, ev.event_type, ev.value,
       {round_ties_safe_sql("(ev.value - m.mean) / nullif(m.std, 0.0)", 2)} AS z
FROM ev JOIN m ON ev.event_type = m.event_type
WHERE abs({round_ties_safe_sql("(ev.value - m.mean) / nullif(m.std, 0.0)", 2)}) > 3
"""


def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (Markov bigrams over each
    user's time-ordered stream): lag over one user_id partitioning,
    then a global (prev, curr) count — the input to funnel mining /
    next-event prediction. Ordering ties broken by event_id so both
    engines see identical sequences."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


TRANSITIONS_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM {EVENTS_DUCK}
)
SELECT prev_type, event_type AS curr_type, count(*) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, curr_type
"""


def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-gap statistics (engagement-cadence
    signal): lag over the same user_id partitioning every other
    temporal op uses, gaps in integer microseconds. The avg follows the
    repo's decimal-sum discipline (like ``events_user_value_decay``):
    the gap sum accumulates EXACTLY in DECIMAL(30,0) — a double sum
    would go order-dependent once a user's gap total passes 2^53 µs —
    then one deterministic double division + round. One shuffle; the
    window and the groupBy share the user_id hash partitioning so
    Catalyst plans a single Exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .filter(F.col("prev_us").isNotNull())
        .select("user_id", (F.unix_micros("ts") - F.col("prev_us")).alias("gap_us"))
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        round_ties_safe(
            F.sum(F.col("gap_us").cast("decimal(30,0)")).cast("double") / F.count("*"), 4
        ).alias("avg_gap_us"),
    )


INTER_ARRIVAL_SQL = f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM {EVENTS_DUCK}
)
SELECT user_id, count(*) AS n_gaps,
       min(us - prev_us) AS min_gap_us,
       max(us - prev_us) AS max_gap_us,
       {round_ties_safe_sql("CAST(sum(CAST(us - prev_us AS DECIMAL(30,0))) AS DOUBLE) / count(*)", 4)}
         AS avg_gap_us
FROM seq
WHERE prev_us IS NOT NULL
GROUP BY user_id
"""


def events_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (WAU). Distinct
    counts don't compose across window frames, so the scalable form is
    the COVERAGE EXPLODE: each (day, user) pair covers the next 7
    window-end days (bounded 7x fan-out of the already-deduped daily
    pairs — tiny vs raw events), then one exact countDistinct per
    window day. No range join, no per-day self-join over the event
    table; report days are semi-joined back to days with actual
    activity so the output has no trailing ghost days."""
    ev = load_table(spark, sf_dir, "events")
    # day as truncated TIMESTAMP, not DATE — the repo's cross-engine
    # day representation (DATE surfaces as different pandas dtypes from
    # the two fetch paths and breaks type-sensitive value hashes)
    du = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    cov = du.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    days = du.select("day").distinct()
    return (
        cov.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


WAU_SQL = f"""
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM {EVENTS_DUCK}),
cov AS (
  SELECT unnest(list_transform(range(7), i -> day + to_days(CAST(i AS INT)))) AS day, user_id
  FROM du
),
days AS (SELECT DISTINCT day FROM du)
SELECT c.day AS day, count(DISTINCT c.user_id) AS wau
FROM cov c SEMI JOIN days d ON c.day = d.day
GROUP BY c.day
"""


def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: average events per (day-of-week, hour-of-
    day) cell, normalized by how many of that weekday appear in the
    data — the load-shape primitive behind capacity planning and
    anomaly baselines. All integer counts until one final rounded
    division; day-of-week aligned to Sunday=0 on both engines (Spark's
    dayofweek is 1-based, DuckDB's dow is 0-based); hour extraction is
    deterministic under the loader's UTC-pinned session."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hour"),
        F.to_date("ts").alias("d"),
    )
    counts = base.groupBy("dow", "hour").agg(F.count("*").alias("n_events"))
    days = (
        base.select("dow", "d").distinct().groupBy("dow").agg(F.count("*").alias("n_days"))
    )
    return counts.join(F.broadcast(days), "dow").select(
        "dow",
        "hour",
        "n_events",
        round_ties_safe(F.col("n_events") / F.col("n_days"), 4).alias("avg_per_day"),
    )


SEASONALITY_SQL = f"""
WITH base AS (
  SELECT CAST(date_part('dow', ts) AS INT) AS dow,
         CAST(date_part('hour', ts) AS INT) AS hour,
         CAST(ts AS DATE) AS d
  FROM {EVENTS_DUCK}
), counts AS (
  SELECT dow, hour, count(*) AS n_events FROM base GROUP BY dow, hour
), days AS (
  SELECT dow, count(DISTINCT d) AS n_days FROM base GROUP BY dow
)
SELECT c.dow, c.hour, c.n_events,
       {round_ties_safe_sql("c.n_events / CAST(dy.n_days AS DOUBLE)", 4)} AS avg_per_day
FROM counts c JOIN days dy ON c.dow = dy.dow
"""


_DECAY_TAU_US = 7 * 86_400_000_000  # 7-day e-folding


def events_user_value_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed value per user (recency-weighted CLV
    — the standard feature-engineering primitive for churn/ranking
    models): sum of value * exp(-(T_max - t)/tau), tau = 7 days.

    Float discipline: the per-row decayed contribution (one exp + one
    multiply) is rounded to 1e-9 and accumulated in DECIMAL(30,9), so
    the SUM is order-independent and bit-identical across engines and
    partitionings; only the per-row exp carries the disclosed 1-ulp
    libm-vs-JVM boundary risk (~1e-12/row at the rounding edge). T_max
    is a 1-row aggregate broadcast-cross-joined into the expression
    (the oracle's ``CROSS JOIN tm`` shape) — no eager driver action, no
    synchronous barrier inside the builder; the whole op stays lazy."""
    ev = load_table(spark, sf_dir, "events")
    tm = ev.agg(F.max(F.unix_micros("ts")).alias("t_max"))
    w = F.exp(-(F.col("t_max") - F.unix_micros("ts")) / F.lit(float(_DECAY_TAU_US)))
    # Tie-safe 9-dp fix of the non-dyadic value*exp(...) double before
    # the decimal cast (cast of the grid-adjacent result is then
    # deterministic and engine-identical).
    contrib = round_ties_safe(F.col("value") * w, 9).cast("decimal(30,9)")
    return (
        ev.crossJoin(F.broadcast(tm))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            # native-round-ok: contrib is DECIMAL(30,9); the sum is exact
            # decimal, rounded identically (HALF_UP) by both engines
            F.round(F.sum(contrib), 4).cast("double").alias("decayed_value"),
        )
    )


DECAY_SQL = f"""
WITH tm AS (SELECT max(epoch_us(ts)) AS t_max FROM {EVENTS_DUCK})
SELECT user_id, count(*) AS n_events,
       CAST(round(sum(CAST({round_ties_safe_sql(f"value * exp(-(tm.t_max - epoch_us(ts)) / {float(_DECAY_TAU_US)})", 9)}
                           AS DECIMAL(30,9))), 4) AS DOUBLE) AS decayed_value
FROM {EVENTS_DUCK} CROSS JOIN tm
GROUP BY user_id
"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: per purchase, how many of the same user's
    error events land in the following hour (p.ts, p.ts + 1h].

    Scale shape — the canonical bucketed range join: a naive theta
    join on the time inequality is a BroadcastNestedLoopJoin (pair
    blowup); instead each purchase interval explodes into the <=2
    hour-bins it covers, errors carry their single bin, the join is a
    plain EQUI-join on (user_id, bin), and the exact inequality is a
    residual filter. Fan-out is bounded by interval/bin ratio (2
    here), the join shuffles on high-cardinality keys, and zero-match
    purchases ride back on one left join against the purchase table."""
    hour_us = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.unix_micros("ts").alias("e_us"),
    )
    p_bins = purchases.withColumn(
        "bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"p_us DIV {hour_us}"),
                    F.expr(f"(p_us + {hour_us}) DIV {hour_us}"),
                )
            )
        ),
    )
    e_bins = errors.withColumn("bin", F.expr(f"e_us DIV {hour_us}"))
    matched = (
        p_bins.join(
            e_bins,
            (F.col("user_id") == F.col("e_user")) & (p_bins.bin == e_bins.bin),
        )
        .filter((F.col("e_us") > F.col("p_us")) & (F.col("e_us") <= F.col("p_us") + hour_us))
        .groupBy("purchase_event_id")
        .agg(F.count("*").alias("n"))
    )
    return purchases.join(matched, "purchase_event_id", "left").select(
        "purchase_event_id",
        "user_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_errors_1h"),
    )


RANGE_JOIN_SQL = f"""
WITH p AS (
  SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS p_us
  FROM {EVENTS_DUCK} WHERE event_type = 'purchase'
), e AS (
  SELECT user_id, epoch_us(ts) AS e_us FROM {EVENTS_DUCK} WHERE event_type = 'error'
)
SELECT p.purchase_event_id, p.user_id,
       CAST(count(e.e_us) AS BIGINT) AS n_errors_1h
FROM p LEFT JOIN e
  ON p.user_id = e.user_id AND e.e_us > p.p_us AND e.e_us <= p.p_us + 3600000000
GROUP BY p.purchase_event_id, p.user_id
"""


def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly engagement stickiness: avg daily active users / monthly
    active users per calendar month — the standard product-health
    ratio. Exact distincts at both grains (one shuffle each over the
    deduped pairs); the avg follows the decimal-sum discipline so it
    is order-independent. Months ride as truncated TIMESTAMPs (the
    repo's cross-engine day/month representation). At 100 TB the exact
    MAU distinct is the expensive grain — the streaming twin family's
    HLL form (``events_approx_distinct_users``) is the sketch
    alternative when 2% error is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("d"),
        "user_id",
    )
    dau = base.groupBy("month", "d").agg(F.countDistinct("user_id").alias("dau"))
    mau = base.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    a = dau.groupBy("month").agg(
        F.count("*").alias("n_days"),
        round_ties_safe(
            F.sum(F.col("dau").cast("decimal(30,0)")).cast("double") / F.count("*"), 4
        ).alias("avg_dau"),
    )
    return a.join(mau, "month").select(
        "month",
        "n_days",
        "avg_dau",
        "mau",
        round_ties_safe(F.col("avg_dau") / F.col("mau").cast("double"), 6).alias("stickiness"),
    )


DAU_MAU_SQL = f"""
WITH base AS (
  SELECT date_trunc('month', ts) AS month, CAST(ts AS DATE) AS d, user_id
  FROM {EVENTS_DUCK}
), dau AS (
  SELECT month, d, count(DISTINCT user_id) AS dau FROM base GROUP BY month, d
), mau AS (
  SELECT month, count(DISTINCT user_id) AS mau FROM base GROUP BY month
), a AS (
  SELECT month, count(*) AS n_days,
         {round_ties_safe_sql("CAST(sum(CAST(dau AS DECIMAL(30,0))) AS DOUBLE) / count(*)", 4)} AS avg_dau
  FROM dau GROUP BY month
)
SELECT a.month AS month, a.n_days, a.avg_dau, m.mau,
       {round_ties_safe_sql("a.avg_dau / CAST(m.mau AS DOUBLE)", 6)} AS stickiness
FROM a JOIN mau m ON a.month = m.month
"""


# --- mergeable histogram quantile sketch ------------------------------

_HIST_BINS = 256
_HIST_QS = (0.5, 0.9, 0.99)


def value_histogram_df(
    ev: DataFrame, lo: float, hi: float, bins: int = _HIST_BINS
) -> DataFrame:
    """(bin, cnt) equi-width histogram with FIXED bounds — the
    mergeable/streamable form (counts sum across shards and
    micro-batches; the data-derived-bounds op above can't stream
    because min/max evolve). Out-of-range values clamp to the edge
    bins, so no row is lost."""
    return (
        ev.select(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("value") - F.lit(lo)) / F.lit(hi - lo) * bins
                    ),
                ),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def events_value_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from a bounded equi-width histogram, with the
    error vs the exact continuous quantile — the estimator-quality eval
    row for the SCALE path to quantiles: bin counts are a
    ``_HIST_BINS``-row mergeable table (shards/streams sum them; the
    exact form needs a global sort), and the estimate interpolates
    inside the bin holding the target rank. Every arithmetic step is a
    single IEEE op over exact integers and the min/max doubles, so the
    DuckDB oracle replays estimates bit-for-bit — unlike
    approx_percentile's engine-internal sketch. The cumulative window
    runs over ≤256 bin rows (SinglePartition by construction and by
    size)."""
    ev = load_table(spark, sf_dir, "events").select("value")
    mm = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").alias("n"),
    )
    binned = ev.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_HIST_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _HIST_BINS
                ),
            )
        )
        .cast("int")
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("cnt"))
    cum = hist.select(
        "bin", "cnt", F.sum("cnt").over(Window.orderBy("bin")).alias("cum")
    )
    qs = spark.createDataFrame([(q,) for q in _HIST_QS], "q double")
    target = F.col("q") * F.col("n")
    width = (F.col("mx") - F.col("mn")) / F.lit(float(_HIST_BINS))
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(mm))
        .filter(F.col("cum") >= target)
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("q").orderBy("bin"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "q",
            round_ties_safe(
                F.col("mn")
                + (
                    F.col("bin")
                    + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
                )
                * width,
                6,
            ).alias("est_value"),
        )
    )
    # exact side in ONE pass: percentile over the q array, exploded
    qarr = ", ".join(str(q) for q in _HIST_QS)
    exact = (
        ev.agg(F.expr(f"percentile(value, array({qarr}))").alias("ps"))
        .select(F.posexplode("ps").alias("i", "exact_raw"))
        .select(
            F.element_at(
                F.array(*[F.lit(q) for q in _HIST_QS]), F.col("i") + 1
            ).alias("q"),
            round_ties_safe(F.col("exact_raw"), 6).alias("exact_value"),
        )
    )
    return hit.join(exact, "q").select(
        "q",
        "est_value",
        "exact_value",
        round_ties_safe(F.col("est_value") - F.col("exact_value"), 6).alias("err"),
    )


def _hist_quantiles_sql() -> str:
    b = _HIST_BINS
    exacts = "\nUNION ALL\n".join(
        f"SELECT {q} AS q, {round_ties_safe_sql(f'quantile_cont(value, {q})', 6)} AS exact_value FROM {EVENTS_DUCK}"
        for q in _HIST_QS
    )
    qvals = ", ".join(f"({q})" for q in _HIST_QS)
    return f"""
WITH mm AS (
  SELECT min(value) AS mn, max(value) AS mx, CAST(count(*) AS BIGINT) AS n
  FROM {EVENTS_DUCK}
),
bnn AS (
  SELECT CASE WHEN mm.mx = mm.mn THEN 0
              ELSE CAST(least({b - 1}, floor((value - mm.mn) / (mm.mx - mm.mn) * {b})) AS INT)
         END AS bin
  FROM {EVENTS_DUCK} CROSS JOIN mm
),
hist AS (SELECT bin, count(*) AS cnt FROM bnn GROUP BY bin),
cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist),
qs(q) AS (VALUES {qvals}),
hit AS (
  SELECT q,
         {round_ties_safe_sql(f"mn + (bin + (q * n - (cum - cnt)) / cnt) * ((mx - mn) / {float(b)})", 6)} AS est_value
  FROM (
    SELECT qs.q, c.bin, c.cnt, c.cum, mm.mn, mm.mx, mm.n,
           row_number() OVER (PARTITION BY qs.q ORDER BY c.bin) AS rn
    FROM cum c CROSS JOIN qs CROSS JOIN mm
    WHERE c.cum >= qs.q * mm.n
  ) t WHERE rn = 1
),
ex AS ({exacts})
SELECT hit.q, hit.est_value, ex.exact_value,
       {round_ties_safe_sql("hit.est_value - ex.exact_value", 6)} AS err
FROM hit JOIN ex ON hit.q = ex.q
"""


# --- deterministic HyperLogLog (Flajolet et al. 2007, portable md5
# hashing) -------------------------------------------------------------
#
# The companion to the CMS sketch: DISTINCT-count state for an
# unbounded key domain in a fixed 2^p-register table. Unlike Spark's
# approx_count_distinct (whose HLL++ sketch is engine-internal), every
# step here is explicit integer/bit arithmetic on the portable h64
# hash, so DuckDB replays the registers AND the estimate bit-for-bit —
# a fully ORACLED approximate-distinct op. Registers merge by MAX
# (idempotent, commutative), which is what makes the sketch the scale
# path: shard-local sketches union without re-reading data, and the
# streaming twin maintains the same table incrementally.

_HLL_P = 9
_HLL_M = 1 << _HLL_P  # 512 registers
_HLL_WBITS = 60 - _HLL_P  # h64 is 60-bit; rank bits left after indexing
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def hll_registers_df(ev: DataFrame) -> DataFrame:
    """(reg, max_rank) register table over ``user_id`` — pure Catalyst
    (md5 + integer div/mod + ``bin()`` bit-length, identical in
    DuckDB). Rank = position of the highest set bit from the top of
    the 51 post-index bits; an all-zero remainder ranks 52."""
    from deker_server_adapters_spark.functions.hashing import h64

    return (
        ev.select(h64(F.col("user_id")).alias("h"))
        .select(
            F.expr(f"pmod(h, {_HLL_M})").cast("long").alias("reg"),
            F.expr(f"h DIV {_HLL_M}").alias("w"),
        )
        .select(
            "reg",
            F.when(
                F.col("w") > 0,
                F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("w"))),
            )
            .otherwise(F.lit(_HLL_WBITS + 1))
            .cast("int")
            .alias("rank"),
        )
        .groupBy("reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register table itself — ≤512 rows whatever the corpus
    size. This is the mergeable artifact a 100 TB pipeline persists per
    shard/day; unions of shards combine by ``max(max_rank)`` with no
    rescan."""
    return hll_registers_df(load_table(spark, sf_dir, "events"))


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user estimate + its error vs the exact count — the
    estimator-quality eval row (the recall-ops pattern). Standard
    small-range correction: linear counting from empty registers when
    the raw estimate is under 2.5·m."""
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers_df(ev)
    sketch = regs.agg(
        F.count("*").alias("occupied"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))), F.lit(0.0)).alias(
            "ssum"
        ),
    )
    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    zeros = F.lit(_HLL_M) - F.col("occupied")
    est_raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / (F.col("ssum") + zeros)
    est = F.when(
        (est_raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
    ).otherwise(est_raw)
    return sketch.crossJoin(F.broadcast(exact)).select(
        F.lit(_HLL_M).cast("long").alias("m_registers"),
        F.col("occupied").cast("long").alias("occupied"),
        round_ties_safe(est, 4).alias("est_users"),
        F.col("n_exact"),
        F.when(
            F.col("n_exact") > 0,
            round_ties_safe((est - F.col("n_exact")) / F.col("n_exact") * 100, 4),
        ).alias("err_pct"),
    )


def _hll_sql_core() -> str:
    from deker_server_adapters_spark.functions.hashing import h64_sql

    return f"""
hllh AS (SELECT {h64_sql("user_id")} AS h FROM events),
hllwr AS (SELECT CAST(h % {_HLL_M} AS BIGINT) AS reg, h // {_HLL_M} AS w FROM hllh),
hllregs AS (
  SELECT reg,
         CAST(max(CASE WHEN w > 0 THEN {_HLL_WBITS + 1} - length(bin(w))
                       ELSE {_HLL_WBITS + 1} END) AS INT) AS max_rank
  FROM hllwr GROUP BY reg
)"""


HLL_REG_SQL = f"""
WITH {_hll_sql_core()}
SELECT reg, max_rank FROM hllregs
"""

HLL_EST_SQL = f"""
WITH {_hll_sql_core()},
sk AS (
  SELECT count(*) AS occupied,
         coalesce(sum(power(2.0, -max_rank)), 0.0) AS ssum
  FROM hllregs
),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events),
est AS (
  SELECT occupied,
         CASE WHEN {_HLL_ALPHA * _HLL_M * _HLL_M} / (ssum + ({_HLL_M} - occupied)) <= {2.5 * _HLL_M}
                   AND ({_HLL_M} - occupied) > 0
              THEN {float(_HLL_M)} * ln({float(_HLL_M)} / ({_HLL_M} - occupied))
              ELSE {_HLL_ALPHA * _HLL_M * _HLL_M} / (ssum + ({_HLL_M} - occupied)) END AS e
  FROM sk
)
SELECT CAST({_HLL_M} AS BIGINT) AS m_registers,
       CAST(occupied AS BIGINT) AS occupied,
       {round_ties_safe_sql("e", 4)} AS est_users,
       ex.n_exact,
       CASE WHEN ex.n_exact > 0 THEN {round_ties_safe_sql("(e - ex.n_exact) / ex.n_exact * 100", 4)} END AS err_pct
FROM est CROSS JOIN ex
"""


# --- purchase attribution (r9) -----------------------------------------

_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback


def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution over the event stream: for every purchase,
    the LAST-touch and FIRST-touch click inside a 7-day lookback (same
    user, click at-or-before the purchase), rolled up per day —
    attribution rate, attributed revenue (decimal-exact), single-touch
    share (first == last), and the mean click→purchase lag.

    Scale shape: both touches come from ONE user-partitioned RANGE
    window over integer event-micros (min/max of a conditional — set
    aggregates, order-independent, so no tie hazards), computed in the
    same pass for every event and filtered to purchases after — no
    purchase×click self-join, whose hot-user fan-out is the naive
    form's cliff. One Exchange on user_id, then a day rollup. Lag sums
    are exact integer micros; the only IEEE ops are the final divides,
    rounded 4."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    base = ev.withColumn("us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_ATTR_WINDOW_US, 0)
    )
    click_us = F.when(F.col("event_type") == "click", F.col("us"))
    p = (
        base.select(
            "event_type",
            "us",
            "value",
            F.max(click_us).over(w).alias("last_click_us"),
            F.min(click_us).over(w).alias("first_click_us"),
        )
        .filter(F.col("event_type") == "purchase")
    )
    agg = p.groupBy(
        F.date_trunc("day", F.timestamp_micros(F.col("us"))).alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum(F.when(F.col("last_click_us").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_attributed"),
        F.sum(
            F.when(
                F.col("last_click_us") == F.col("first_click_us"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_single_touch"),
        F.round(
            F.sum(
                F.when(
                    F.col("last_click_us").isNotNull(),
                    F.col("value").cast("decimal(30,6)"),
                ).otherwise(F.lit(0).cast("decimal(30,6)"))
            ),
            2,
        )
        .cast("double")
        .alias("attributed_value"),
        F.sum(
            F.when(
                F.col("last_click_us").isNotNull(),
                F.col("us") - F.col("last_click_us"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("lag_us_total"),
    )
    return agg.select(
        "day",
        "n_purchases",
        "n_attributed",
        "n_single_touch",
        round_ties_safe(F.col("n_attributed") / F.col("n_purchases"), 4).alias(
            "attribution_rate"
        ),
        "attributed_value",
        F.when(
            F.col("n_attributed") > 0,
            round_ties_safe(
                F.col("lag_us_total") / F.col("n_attributed") / 6e7, 4
            ),
        ).alias("avg_lag_minutes"),
    )


ATTRIBUTION_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, value FROM {EVENTS_DUCK}
),
touched AS (
  SELECT event_type, us, value,
         max(CASE WHEN event_type = 'click' THEN us END) OVER w AS last_click_us,
         min(CASE WHEN event_type = 'click' THEN us END) OVER w AS first_click_us
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING AND CURRENT ROW)
),
p AS (SELECT * FROM touched WHERE event_type = 'purchase'),
agg AS (
  SELECT date_trunc('day', make_timestamp(us)) AS day,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(CASE WHEN last_click_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         CAST(sum(CASE WHEN last_click_us = first_click_us THEN 1 ELSE 0 END) AS BIGINT) AS n_single_touch,
         CAST(round(sum(CASE WHEN last_click_us IS NOT NULL
                             THEN CAST(value AS DECIMAL(30,6))
                             ELSE CAST(0 AS DECIMAL(30,6)) END), 2) AS DOUBLE) AS attributed_value,
         CAST(sum(CASE WHEN last_click_us IS NOT NULL THEN us - last_click_us ELSE 0 END) AS BIGINT) AS lag_us_total
  FROM p GROUP BY day
)
SELECT day, n_purchases, n_attributed, n_single_touch,
       {round_ties_safe_sql("n_attributed / CAST(n_purchases AS DOUBLE)", 4)} AS attribution_rate,
       attributed_value,
       CASE WHEN n_attributed > 0
            THEN {round_ties_safe_sql("lag_us_total / CAST(n_attributed AS DOUBLE) / 6e7", 4)} END AS avg_lag_minutes
FROM agg
"""


# --- rolling WAU from merged daily HLL sketches (r9) ------------------


def daily_hll_registers_df(ev: DataFrame) -> DataFrame:
    """(day, reg, max_rank) — one ≤512-row HLL register table per day,
    the persistable daily sketch artifact ``events_wau_hll_rolling``
    max-merges into rolling windows (its streaming producer twin is
    ``streaming/events_stream.streaming_daily_hll_registers``)."""
    from deker_server_adapters_spark.functions.hashing import h64

    return (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            h64(F.col("user_id")).alias("h"),
        )
        .select(
            "day",
            F.expr(f"pmod(h, {_HLL_M})").cast("long").alias("reg"),
            F.expr(f"h DIV {_HLL_M}").alias("w"),
        )
        .select(
            "day",
            "reg",
            F.when(
                F.col("w") > 0,
                F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("w"))),
            )
            .otherwise(F.lit(_HLL_WBITS + 1))
            .cast("int")
            .alias("rank"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def events_wau_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from MERGED DAILY HLL REGISTER
    tables, with per-day error vs the exact rolling WAU — the sketch
    COMPOSITION the 100 TB pipeline actually runs: persist one ≤512-row
    register table per day (never re-scan raw events), answer any
    rolling window by max-merging 7 of them. The merge is the
    coverage-explode of the daily register tables (bounded 7× fan-out
    of ≤512-row tables — trivia next to the wau_rolling op's fan-out of
    all daily user pairs), so window length scales in sketch rows, not
    users. Deterministic HLL (md5 hash, integer rank arithmetic) means
    the DuckDB oracle replays daily sketching, the 7-day max-merge AND
    the corrected estimates bit-for-bit — per-day err_pct is itself
    hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    daily = daily_hll_registers_df(ev)
    cov = daily.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("day"),
        "reg",
        "max_rank",
    )
    days = daily.select("day").distinct()
    merged = (
        cov.join(days, "day", "left_semi")
        .groupBy("day", "reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    sketch = merged.groupBy("day").agg(
        F.count("*").alias("occupied"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("ssum"),
    )
    zeros = F.lit(_HLL_M) - F.col("occupied")
    est_raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / (F.col("ssum") + zeros)
    e = F.when(
        (est_raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
    ).otherwise(est_raw)
    ests = sketch.select("day", e.alias("e"))
    exact = events_wau_rolling(spark, sf_dir)
    return ests.join(exact, "day").select(
        "day",
        F.col("wau").alias("exact_wau"),
        round_ties_safe(F.col("e"), 4).alias("est_wau"),
        round_ties_safe((F.col("e") - F.col("wau")) / F.col("wau") * 100, 4).alias(
            "err_pct"
        ),
    )


def _wau_hll_sql() -> str:
    from deker_server_adapters_spark.functions.hashing import h64_sql

    return f"""
WITH hd AS (
  SELECT date_trunc('day', ts) AS day, {h64_sql("user_id")} AS h FROM {EVENTS_DUCK}
),
hr AS (SELECT day, CAST(h % {_HLL_M} AS BIGINT) AS reg, h // {_HLL_M} AS w FROM hd),
dailyregs AS (
  SELECT day, reg,
         CAST(max(CASE WHEN w > 0 THEN {_HLL_WBITS + 1} - length(bin(w))
                       ELSE {_HLL_WBITS + 1} END) AS INT) AS max_rank
  FROM hr GROUP BY day, reg
),
cov AS (
  SELECT unnest(list_transform(range(7), i -> day + to_days(CAST(i AS INT)))) AS day,
         reg, max_rank
  FROM dailyregs
),
days AS (SELECT DISTINCT day FROM dailyregs),
merged AS (
  SELECT c.day AS day, c.reg, max(c.max_rank) AS max_rank
  FROM cov c SEMI JOIN days d ON c.day = d.day
  GROUP BY c.day, c.reg
),
sk AS (
  SELECT day, count(*) AS occupied, sum(power(2.0, -max_rank)) AS ssum
  FROM merged GROUP BY day
),
est AS (
  SELECT day,
         CASE WHEN {_HLL_ALPHA * _HLL_M * _HLL_M} / (ssum + ({_HLL_M} - occupied)) <= {2.5 * _HLL_M}
                   AND ({_HLL_M} - occupied) > 0
              THEN {float(_HLL_M)} * ln({float(_HLL_M)} / ({_HLL_M} - occupied))
              ELSE {_HLL_ALPHA * _HLL_M * _HLL_M} / (ssum + ({_HLL_M} - occupied)) END AS e
  FROM sk
),
exact AS ({WAU_SQL})
SELECT x.day AS day, x.wau AS exact_wau, {round_ties_safe_sql("e.e", 4)} AS est_wau,
       {round_ties_safe_sql("(e.e - x.wau) / x.wau * 100", 4)} AS err_pct
FROM est e JOIN exact x ON e.day = x.day
"""


# --- session duration distribution (r9) -------------------------------

_SDQ_QS = (0.5, 0.9, 0.99)


def events_session_duration_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session DURATION distribution — p50/p90/p99 of gap-based session
    lengths, the product-analytics staple next to the session table
    itself. A composition of two already-proven devices: the
    ``events_sessionization`` window pipeline feeds the 256-bin
    histogram quantile estimator, so the whole thing stays
    bounded-state (the alternative — exact percentile over all session
    durations — buffers every session in one task). Durations are
    exact integer micros (no float time math); estimates interpolate
    inside the hit bin and convert to seconds at the end. The heavy
    zero-duration mass (single-event sessions) just occupies bin 0 —
    reported separately as ``n_single_event`` so the quantiles read
    correctly."""
    sess = events_sessionization(spark, sf_dir)
    dur = sess.select(
        (F.unix_micros("session_end") - F.unix_micros("session_start"))
        .cast("double")
        .alias("v")
    )
    n0 = dur.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_single_event")
    )
    est = grouped_hist_quantile_estimates(spark, dur, [], _SDQ_QS, _HIST_BINS)
    return est.crossJoin(F.broadcast(n0)).select(
        "q",
        F.col("n").cast("long").alias("n_sessions"),
        "n_single_event",
        round_ties_safe(F.col("est") / 1e6, 6).alias("est_duration_sec"),
    )


hq_sdq = hist_quantile_sql_ctes("dur", [], _SDQ_QS, _HIST_BINS)

SESSION_DURATION_SQL = f"""
WITH sessions AS ({SESSION_SQL}),
dur AS (
  SELECT CAST(epoch_us(session_end) - epoch_us(session_start) AS DOUBLE) AS v
  FROM sessions
),
{hq_sdq},
n0 AS (
  SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_event
  FROM dur
)
SELECT q, CAST(n AS BIGINT) AS n_sessions, n0.n_single_event,
       floor((est / 1e6) * 1000000.0 + 0.5) / 1000000.0 AS est_duration_sec
FROM hqest CROSS JOIN n0
"""


OPS = {
    "events_tumbling_window": Op("events_tumbling_window", events_tumbling_window, TUMBLING_SQL),
    "events_purchase_attribution": Op(
        "events_purchase_attribution",
        events_purchase_attribution,
        ATTRIBUTION_SQL,
        description=(
            "first/last-touch purchase attribution from one user-"
            "partitioned RANGE window (no purchase x click self-join); "
            "daily rate/revenue/lag rollup"
        ),
    ),
    "events_wau_hll_rolling": Op(
        "events_wau_hll_rolling",
        events_wau_hll_rolling,
        _wau_hll_sql(),
        description=(
            "rolling 7-day WAU from max-merged DAILY HLL register "
            "tables + per-day err vs exact — the persist-sketches-"
            "not-rescan composition; merge fan-out is sketch rows, "
            "not users"
        ),
    ),
    "events_session_duration_quantiles": Op(
        "events_session_duration_quantiles",
        events_session_duration_quantiles,
        SESSION_DURATION_SQL,
        description=(
            "p50/p90/p99 gap-session durations: sessionization window "
            "pipeline composed with the bounded 256-bin histogram "
            "quantile estimator"
        ),
    ),
    "events_dau_mau_stickiness": Op(
        "events_dau_mau_stickiness", events_dau_mau_stickiness, DAU_MAU_SQL
    ),
    "events_pivot_types": Op("events_pivot_types", events_pivot_types, PIVOT_SQL),
    "events_rolling_1h": Op("events_rolling_1h", events_rolling_1h, ROLLING_SQL),
    "events_latest_per_user": Op("events_latest_per_user", events_latest_per_user, LATEST_SQL),
    "events_approx_distinct_users": Op(
        "events_approx_distinct_users", events_approx_distinct_users, None
    ),
    "events_approx_quantiles": Op("events_approx_quantiles", events_approx_quantiles, None),
    "events_value_histogram_quantiles": Op(
        "events_value_histogram_quantiles",
        events_value_histogram_quantiles,
        _hist_quantiles_sql(),
        description=(
            f"quantile estimates from a {_HIST_BINS}-bin mergeable "
            "equi-width histogram + error vs the exact continuous "
            "quantile — the bounded-state scale path to percentiles, "
            "fully oracled unlike approx_percentile's internal sketch"
        ),
    ),
    "events_hll_registers": Op(
        "events_hll_registers",
        events_hll_registers,
        HLL_REG_SQL,
        description=(
            f"deterministic HyperLogLog register table (p={_HLL_P}, "
            f"m={_HLL_M}): distinct-count state for an unbounded key "
            "domain in <=512 rows, merged by max — fully oracled, "
            "unlike engine-internal approx_count_distinct sketches"
        ),
    ),
    "events_hll_distinct": Op(
        "events_hll_distinct",
        events_hll_distinct,
        HLL_EST_SQL,
        description=(
            "HLL distinct-user estimate with linear-counting small-range "
            "correction + error vs exact — the estimator-quality eval row"
        ),
    ),
    "events_heavy_hitters_cms": Op(
        "events_heavy_hitters_cms",
        events_heavy_hitters_cms,
        CMS_SQL,
        description=(
            f"count-min sketch as a bounded (d={_CMS_D}, w={_CMS_W}) "
            "aggregate table with portable md5 hashing; candidates from "
            "a deterministic 2% event sample; estimates never "
            "underestimate, error bound pytest-checked"
        ),
    ),
    "events_props_json": Op("events_props_json", events_props_json, PROPS_JSON_SQL),
    "events_distinct_users_daily": Op(
        "events_distinct_users_daily", events_distinct_users_daily, DISTINCT_USERS_SQL
    ),
    "events_value_percentiles": Op(
        "events_value_percentiles", events_value_percentiles, PERCENTILES_SQL
    ),
    "events_sessionization": Op(
        "events_sessionization", events_sessionization, SESSION_SQL, headline=True
    ),
    "events_running_totals": Op("events_running_totals", events_running_totals, RUNNING_SQL),
    "events_asof_join": Op("events_asof_join", events_asof_join, ASOF_SQL),
    "events_top_users": Op("events_top_users", events_top_users, TOP_USERS_SQL),
    "events_funnel": Op("events_funnel", events_funnel, FUNNEL_SQL),
    "events_retention_cohorts": Op(
        "events_retention_cohorts", events_retention_cohorts, RETENTION_SQL
    ),
    "events_anomaly_zscore": Op(
        "events_anomaly_zscore",
        events_anomaly_zscore,
        ANOMALY_SQL,
        description=(
            "decimal-exact moments (bit-identical across engines); "
            "single-event / zero-variance types yield NULL z and are "
            "filtered, not divided (ANSI-safe); tie-rounding note: "
            "round_ties_safe rounds NEGATIVE halves toward +inf (not "
            "HALF_UP's away-from-zero), so a negative z sitting exactly "
            "on a rounding boundary classifies on the +inf side in BOTH "
            "engines"
        ),
    ),
    "events_type_transitions": Op(
        "events_type_transitions", events_type_transitions, TRANSITIONS_SQL
    ),
    "events_inter_arrival": Op(
        "events_inter_arrival",
        events_inter_arrival,
        INTER_ARRIVAL_SQL,
        description=(
            "rounding-domain note: gaps round at 4 dp, valid while "
            "|gap_us|*1e4 < 2^53 (~28,500 years in microseconds) — past "
            "that round_ties_safe degrades to identity identically in "
            "both engines (parity holds; the displayed precision is "
            "what saturates)"
        ),
    ),
    "events_melt_type_counts": Op(
        "events_melt_type_counts",
        events_melt_type_counts,
        MELT_SQL.format(ev=EVENTS_DUCK),
    ),
    "events_hourly_seasonality": Op(
        "events_hourly_seasonality", events_hourly_seasonality, SEASONALITY_SQL
    ),
    "events_user_value_decay": Op(
        "events_user_value_decay",
        events_user_value_decay,
        DECAY_SQL,
        description=(
            "7-day e-folding recency weight; per-row contribution rounded "
            "to 1e-9 then decimal-accumulated (order-independent sum)"
        ),
    ),
    "events_range_join": Op(
        "events_range_join",
        events_range_join,
        RANGE_JOIN_SQL,
        description=(
            "bucketed range join: intervals explode into <=2 hour-bins, "
            "equi-join on (user_id, bin) + residual inequality — never a "
            "nested-loop theta join"
        ),
    ),
    "events_wau_rolling": Op(
        "events_wau_rolling",
        events_wau_rolling,
        WAU_SQL,
        description=(
            "coverage-explode form: daily-distinct pairs fan out 7x, one "
            "exact countDistinct per window day; no range join"
        ),
    ),
}
