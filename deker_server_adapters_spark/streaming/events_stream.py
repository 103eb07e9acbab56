"""Structured Streaming twins of the batch events operators.

The batch forms in ``operators/events.py`` are the oracle-checked
semantics; these run the same logic as incremental streams:

- source: file stream over the events parquet (schema-pinned), or any
  readStream the caller supplies;
- ``streaming_tumbling_window``: watermarked hourly windows — late
  events beyond the watermark are dropped, on a cluster state is
  bounded per (window, event_type);
- ``streaming_running_totals``: stateful per-user running sums via
  ``applyInPandasWithState`` (the custom-stateful-operator escape
  hatch);
- ``streaming_sessionization``: gap-based sessions with
  ``session_window`` (native session windows + watermark).

Tests drive them with the memory sink and assert equality with the
batch twins (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Schema of the NORMALIZED staging copy written by stream_events_source
# (ts already truncated to micros TIMESTAMP_LTZ by the batch loader) —
# NOT the raw driver parquet, whose physical ts encoding has varied
# across data regenerations (nanos / micros-NTZ / micros-LTZ).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events_source(
    spark: SparkSession, sf_dir: str, n_files: int | None = None
) -> DataFrame:
    """File-stream over the events parquet with the same ts
    normalization as the batch loader.

    Delegates the physical-type handling (nanos bigint / micros NTZ /
    micros LTZ) to ``sources.tables.load_table`` and stages a
    normalized parquet copy for the stream to read, so the pinned
    stream schema never depends on which encoding the driver's data
    generator used.

    ``n_files``: split the input into that many time-ranged files and
    feed them one per micro-batch (maxFilesPerTrigger=1) — exercises
    state carried across triggers instead of a single giant batch.
    """
    from deker_server_adapters_spark.sources.scratch import staged_dir
    from deker_server_adapters_spark.sources.tables import load_table

    # The normalized copy is deterministic per (sf_dir, n_files): cache
    # it so repeated calls in one process (bench rounds, test suites)
    # stage once instead of accumulating temp copies (ADVICE r5). The
    # dirs are removed at process exit.
    stream_dir, staged = staged_dir("deker_events_stream_", sf_dir, n_files)
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if not staged:
        batch = load_table(spark, sf_dir, "events")  # pins UTC + normalizes ts
        if n_files:
            # range-partition by ts so lexicographic part order == time
            # order across the per-trigger files
            batch.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(
                stream_dir
            )
        else:
            # single micro-batch: file order is irrelevant, skip the
            # global range sort a 1-partition repartitionByRange would be
            batch.write.mode("overwrite").parquet(stream_dir)
    if n_files:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(stream_dir)


def streaming_tumbling_window(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly tumbling-window aggregate with a watermark: the streaming
    twin of ``events_tumbling_window``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def streaming_sessionization(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via native session windows: the streaming twin
    of ``events_sessionization`` (session identity is (user, window)
    rather than an ordinal, the streaming-natural key)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_value", "session_start", "session_end")
    )


def streaming_exact_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first event per (user_id, event_type,
    value-hash) within the watermark horizon survives — the streaming
    twin of hash-groupBy dedup.

    Uses ``dropDuplicatesWithinWatermark`` so each key's state row is
    EVICTED once the watermark passes its event time + delay — plain
    ``dropDuplicates`` on a non-event-time subset keeps state forever,
    which on an unbounded stream is an OOM, not a dedup. Duplicates
    arriving within ``watermark`` of the first occurrence are dropped;
    a repeat of the same key beyond the horizon is treated as new
    (bounded-state semantics, the only kind that survives 100 TB/day)."""
    keyed = events.withColumn(
        "dedup_key", F.md5(F.concat_ws("|", "user_id", "event_type", F.col("value").cast("string")))
    )
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["dedup_key"])
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def streaming_purchase_error_join(
    events: DataFrame, horizon: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each error joined to the same
    user's purchases in the preceding 10 minutes. Watermarks on both
    sides bound the join state (Spark buffers only events inside the
    watermark + interval horizon)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("p_ts") <= F.col("e_ts"))
        & (F.col("p_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return purchases.join(errors, cond).select(
        "error_id", F.col("e_user").alias("user_id"), "e_ts", "p_ts", "purchase_value"
    )


def streaming_running_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative value via applyInPandasWithState — the
    pattern for stateful operators Spark lacks natively. Emits one row
    per input event with the running sum at that event."""
    import numpy as np
    import pandas as pd

    out_schema = (
        "event_id long, user_id long, ts timestamp, running_value double, event_seq long"
    )
    state_schema = "total double, seq long"

    def update(key, pdfs, state):
        total, seq = state.get if state.exists else (0.0, 0)  # .get is a property
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            vals = pdf["value"].to_numpy(dtype=np.float64)
            n = len(vals)
            if n == 0:
                continue
            # cumsum seeded with the carried total reproduces the
            # sequential ((total+v1)+v2)+... addition order exactly —
            # vectorized, no per-row Series (iterrows)
            running = np.cumsum(np.concatenate(([total], vals)))[1:]
            frames.append(
                pd.DataFrame(
                    {
                        "event_id": pdf["event_id"].to_numpy(),
                        "user_id": np.full(n, key[0], dtype=np.int64),
                        "ts": pdf["ts"],
                        "running_value": np.round(running, 2),
                        "event_seq": np.arange(seq + 1, seq + n + 1, dtype=np.int64),
                    }
                )
            )
            total = float(running[-1])
            seq += n
        state.update((total, seq))
        cols = ["event_id", "user_id", "ts", "running_value", "event_seq"]
        yield pd.concat(frames)[cols] if frames else pd.DataFrame(columns=cols)

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Stateful twin of the batch ``events_funnel``: per-user funnel
    progression (click -> first view strictly after it -> first
    purchase strictly after that) maintained as three timestamps of
    state per user — O(users) state, no event retention. Each
    micro-batch emits the user's refreshed (stage, t1, t2, t3) row
    (update semantics); aggregating the final per-user stages
    reproduces the batch op's three funnel counts.

    The per-batch transition is the batch op's min-chain applied to
    the batch's events given the carried state (vectorized masked
    mins, not a per-row loop): t1 locks to the earliest click seen,
    then t2 to the earliest view with ts > t1, then t3 likewise for
    purchases. Under event-time-ordered micro-batch replay this
    equals the batch chain EXACTLY (single-batch pytest); under
    arbitrary arrival order each user's stage is a lower bound of the
    batch stage (a late-arriving earlier click can only have delayed
    a lock-in, never forged one — multi-batch pytest pins the bound).
    Stages are monotone per user, so the latest emitted row is always
    the best known verdict."""
    import numpy as np
    import pandas as pd

    out_schema = "user_id long, stage int, t1 timestamp, t2 timestamp, t3 timestamp"
    state_schema = "t1_us long, t2_us long, t3_us long"
    unset = -1  # event timestamps are positive epoch-us

    def update(key, pdfs, state):
        t1, t2, t3 = state.get if state.exists else (unset, unset, unset)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks and t3 == unset:
            pdf = pd.concat(chunks, ignore_index=True)
            ets = pdf["event_type"].to_numpy()
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            if t1 == unset:
                m = us[ets == "click"]
                if len(m):
                    t1 = int(m.min())
            if t1 != unset and t2 == unset:
                m = us[(ets == "view") & (us > t1)]
                if len(m):
                    t2 = int(m.min())
            if t2 != unset and t3 == unset:
                m = us[(ets == "purchase") & (us > t2)]
                if len(m):
                    t3 = int(m.min())
        state.update((t1, t2, t3))
        stage = int(t1 != unset) + int(t2 != unset) + int(t3 != unset)

        def _ts(v):
            return pd.Timestamp(v, unit="us") if v != unset else pd.NaT

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage": [stage],
                "t1": [_ts(t1)],
                "t2": [_ts(t2)],
                "t3": [_ts(t3)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def streaming_retention(events: DataFrame) -> DataFrame:
    """Stateful twin of the batch ``events_retention_cohorts``: per
    user, the cohort day (first active day) plus an 8-BIT MASK of
    which day-N offsets (0..7) have been seen — two longs of state per
    user, no event retention. Each (user, day_n) pair is emitted
    EXACTLY ONCE (append mode), the first time its bit sets; the batch
    op's (cohort_day, day_n, n_users) counts are the emitted rows
    aggregated, which the pytest does. Day arithmetic is UTC epoch-day
    integers (the loader pins the session to UTC, so the batch op's
    date_trunc('day') is the same floor).

    Ordering contract (the funnel twin's): under event-time-ordered
    micro-batch replay the emitted set equals the batch op exactly —
    the cohort day locks to the true minimum before any later day is
    scored against it. Under arbitrary arrival order emission stays
    exactly-once and cohort-consistent (every row scored against the
    locked cohort), but a day EARLIER than the locked cohort arrives
    with a negative offset and is skipped — a documented lower bound,
    never a wrong pair."""
    import numpy as np
    import pandas as pd

    out_schema = "user_id long, cohort_day timestamp, day_n long"
    state_schema = "cohort_day_us long, seen_mask long"
    day_us = 86_400_000_000

    def update(key, pdfs, state):
        cohort_us, mask = state.get if state.exists else (-1, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            days = np.unique(us // day_us * day_us)
            if cohort_us < 0:
                cohort_us = int(days.min())
            for d in days:
                day_n = (int(d) - cohort_us) // day_us
                if 0 <= day_n <= 7 and not (mask >> day_n) & 1:
                    mask |= 1 << day_n
                    rows.append(day_n)
        state.update((cohort_us, mask))
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(rows), key[0], dtype=np.int64),
                    "cohort_day": pd.to_datetime(cohort_us, unit="us"),
                    "day_n": np.array(rows, dtype=np.int64),
                }
            )
        else:
            yield pd.DataFrame(columns=["user_id", "cohort_day", "day_n"])

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def streaming_wau_sliding(events: DataFrame) -> DataFrame:
    """Streaming twin of ``events_wau_rolling``: 7-day sliding windows
    advancing daily, approximate distinct users per window.

    The deliberate batch/stream split: exact rolling distincts need
    the full user set per window (unbounded state on a stream), so the
    streaming form uses approx_count_distinct (HLL++ — bounded sketch
    state per window) under a 1-day watermark, while the batch op
    stays exact and oracle-checked. HLL is deterministic for the same
    input set, so a single-batch run equals the batch form of the SAME
    approximate aggregate exactly (pytest-pinned)."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("wau_approx"))
        .select(F.col("w.end").alias("window_end"), "wau_approx")
    )


def streaming_inter_arrival(events: DataFrame) -> DataFrame:
    """Stateful twin of the batch ``events_inter_arrival``: per-user
    inter-arrival gap statistics maintained incrementally. State is
    five scalars per user (last timestamp + count/min/max/sum of gaps)
    — O(users) state total, no event retention; each micro-batch emits
    the user's refreshed stats (update semantics).

    Cross-batch guarantee: a gap spanning two micro-batches is counted
    exactly once, against the carried last-event timestamp. Within a
    batch, ALL Arrow chunks for the group are concatenated and sorted
    ONCE by (ts, event_id) — the batch op's window order —
    before gaps are computed: ``applyInPandasWithState`` delivers a
    micro-batch as multiple pandas chunks (``arrow.maxRecordsPerBatch``
    rows each) in no guaranteed order, so a per-chunk sort would
    compute cross-chunk gaps in arrival order (even negative ones).
    Gap COUNTS are arrival-order independent across MICRO-BATCHES; gap
    VALUES equal the batch op's exactly when micro-batches arrive in
    event-time order (the file-source multi-batch test asserts the
    count invariant, the single-batch test full equality)."""
    import numpy as np
    import pandas as pd

    out_schema = (
        "user_id long, n_gaps long, min_gap_us long, max_gap_us long, avg_gap_us double"
    )
    state_schema = "last_us long, n long, mn long, mx long, sm long"

    def update(key, pdfs, state):
        have_last = state.exists
        last_us, n, mn, mx, sm = state.get if state.exists else (0, 0, 0, 0, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            seq = np.concatenate(([last_us], us)) if have_last else us
            gaps = np.diff(seq)
            if len(gaps):
                gmn, gmx = int(gaps.min()), int(gaps.max())
                mn = gmn if n == 0 else min(mn, gmn)
                mx = gmx if n == 0 else max(mx, gmx)
                sm += int(gaps.sum())
                n += len(gaps)
            last_us = int(us[-1])
            have_last = True
        state.update((last_us, n, mn, mx, sm))
        cols = ["user_id", "n_gaps", "min_gap_us", "max_gap_us", "avg_gap_us"]
        if n > 0:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_gaps": [n],
                    "min_gap_us": [mn],
                    "max_gap_us": [mx],
                    "avg_gap_us": [round(sm / n, 4)],
                }
            )
        else:
            yield pd.DataFrame(columns=cols)

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def streaming_anomaly_zscore(events: DataFrame, stats: DataFrame) -> DataFrame:
    """STREAM-STATIC join: score a live event stream against
    batch-computed per-type moments (the deploy pattern for the batch
    ``events_anomaly_zscore`` — stats refresh on a batch cadence, the
    stream only broadcasts-joins and filters, no streaming state at
    all). ``stats`` must carry (event_type, mean, std), e.g. from
    ``operators.events.anomaly_stats_df``; std=0 rows yield NULL z and
    are filtered, same as the batch op."""
    from pyspark.sql import functions as F

    z = (F.col("value") - F.col("mean")) / F.nullif(F.col("std"), F.lit(0.0))
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 2))
        .filter(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", "value", "z")
    )


def streaming_cms_sketch(events: DataFrame) -> DataFrame:
    """Streaming count-min sketch: the batch op's bounded d x w
    aggregate table (``operators.events.heavy_hitters_cms_df``)
    maintained incrementally as a plain streaming aggregation.

    This is the whole point of sketch-shaped state on a stream:
    frequency state for an UNBOUNDED key domain (user ids) held in
    exactly D*W = 40960 rows of streaming-agg state, never growing
    with the stream — where a per-user count aggregate would hold
    O(users) state. Counts only increase, partials merge by addition
    (the CMS property), so update-mode emits are monotone and the
    sketch after any prefix equals the batch sketch of that prefix
    exactly (pytest-pinned single- and multi-batch). Probing for
    heavy-hitter estimates stays a batch-side broadcast join against
    this table, same as the batch op."""
    from pyspark.sql import functions as F

    from deker_server_adapters_spark.operators.events import _CMS_BUCKETS, _H32

    hu = _H32.format(col="user_id")
    return (
        events.select(F.expr(hu).alias("h"))
        .select(F.posexplode(F.expr(f"array({_CMS_BUCKETS})")).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def streaming_hll_registers(events: DataFrame) -> DataFrame:
    """Streaming HyperLogLog: the batch op's ≤512-row register table
    (``operators.events.hll_registers_df``) maintained incrementally as
    a plain streaming MAX aggregation — the distinct-count companion to
    the CMS twin. Register maxima only grow and merge idempotently
    (max is commutative/associative/idempotent), so update-mode emits
    are monotone and the sketch after any stream prefix equals the
    batch sketch of that prefix exactly: O(1) state for distinct
    counting over an unbounded user domain, where the exact streaming
    ``approx_count_distinct`` alternative is engine-internal and a
    per-user distinct aggregate holds O(users) state."""
    from deker_server_adapters_spark.operators.events import hll_registers_df

    return hll_registers_df(events)


def streaming_daily_hll_registers(
    events: DataFrame, watermark: str = "35 days"
) -> DataFrame:
    """DAY-KEYED HLL register maintenance — the streaming PRODUCER of
    the per-day (day, reg, max_rank) sketch tables that the batch
    ``events_wau_hll_rolling`` op max-merges into rolling-window
    distinct counts: on a 100 TB/day stream you persist these ≤512-row
    tables per day and never rescan raw events for any window query.
    The day key is a 1-day event-time window over the watermarked
    timestamp (the streaming-legal form of ``date_trunc``; identical
    UTC day starts), so days older than the watermark horizon EVICT —
    live state is (days inside the horizon) × ≤512 rows, bounded
    whatever the stream length or user cardinality. Set ``watermark``
    to the late-data horizon you actually accept; the default covers
    the whole test corpus because the test harness's file stream is
    modification-time-ordered, not event-time-ordered, and a short
    horizon would discard out-of-order micro-batches wholesale.
    Register maxima merge idempotently, so the table for any closed
    day equals the batch ``daily_hll_registers_df`` of that day's
    events exactly."""
    from deker_server_adapters_spark.operators.events import _HLL_M, _HLL_WBITS
    from deker_server_adapters_spark.functions.hashing import h64

    ev = events.withWatermark("ts", watermark)
    return (
        ev.select(
            F.window("ts", "1 day").alias("win"),
            h64(F.col("user_id")).alias("h"),
        )
        .select(
            "win",
            F.expr(f"pmod(h, {_HLL_M})").cast("long").alias("reg"),
            F.expr(f"h DIV {_HLL_M}").alias("w"),
        )
        .select(
            "win",
            "reg",
            F.when(
                F.col("w") > 0,
                F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("w"))),
            )
            .otherwise(F.lit(_HLL_WBITS + 1))
            .cast("int")
            .alias("rank"),
        )
        .groupBy("win", "reg")
        .agg(F.max("rank").alias("max_rank"))
        .select(F.col("win.start").alias("day"), "reg", "max_rank")
    )


def streaming_value_histogram(
    events: DataFrame, lo: float, hi: float, bins: int | None = None
) -> DataFrame:
    """Streaming value histogram: the fixed-bounds
    ``operators.events.value_histogram_df`` maintained incrementally as
    a plain streaming COUNT aggregation — the quantile-state member of
    the sketch-twin trilogy (CMS = frequency, HLL = distinct,
    histogram = quantiles). Bin counts merge by addition, so
    update-mode emits are monotone and the table after any stream
    prefix equals the batch histogram of that prefix exactly; state is
    bounded at ``bins`` rows whatever the stream length, and quantile
    estimates interpolate from the table batch-side exactly as the
    batch op does. Bounds are FIXED configuration (historical min/max)
    — the price of streamability, since data-derived bounds evolve
    mid-stream."""
    from deker_server_adapters_spark.operators.events import (
        _HIST_BINS,
        value_histogram_df,
    )

    return value_histogram_df(events, lo, hi, _HIST_BINS if bins is None else bins)


def streaming_inactivity_alerts(
    events: DataFrame, idle: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user inactivity alerts via EVENT-TIME TIMEOUTS — the state-
    eviction half of the custom-stateful API the other stateful twins
    (NoTimeout) never touch: when a user goes ``idle`` with no events,
    the state's timeout fires (driven by the event-time watermark, so
    wall-clock stalls don't cause false alerts) and ONE alert row emits
    with the user's last-seen time and event count, after which the
    state row is REMOVED — O(active users within the idle horizon)
    state, the abandoned-session/cart shape.

    Semantics: an event for an already-alerted user simply starts a new
    session-state; alerts are per idle-gap, not per user forever.
    Precision: state carries last_seen at MILLISECOND grain (the
    GroupState timeout API is ms-based), so an alert's last_seen can
    sit up to 999 us before the true event time."""
    import pandas as pd

    idle_ms = {"30 minutes": 30 * 60_000}.get(idle)
    if idle_ms is None:
        import re as _re

        m = _re.fullmatch(r"(\d+)\s*minutes?", idle)
        if not m:
            raise ValueError(f"idle must be '<N> minutes', got {idle!r}")
        idle_ms = int(m.group(1)) * 60_000

    out_schema = "user_id long, last_seen timestamp, n_events long"
    state_schema = "last_ms long, n long"

    def update(key, pdfs, state):
        if state.hasTimedOut:
            last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_seen": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        last_ms, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_ms = (
                pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
            )
            last_ms = max(last_ms, int(ts_ms.max()))
            n += len(pdf)
        state.update((last_ms, n))
        # a group whose events arrived AT the watermark edge can have
        # last_ms + idle already behind the watermark (Spark rejects a
        # timeout in the past) — clamp to just past it so the alert
        # fires on the next watermark advance instead of crashing
        state.setTimeoutTimestamp(
            max(last_ms + idle_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(columns=["user_id", "last_seen", "n_events"])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )
