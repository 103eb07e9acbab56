"""Scale stress harness: replicate the sf tables KX with perturbed
keys into /tmp, run the headline queries, and report per-query seconds
at 1x vs Kx. A query whose runtime grows much faster than K has a
scaling cliff (quadratic pair blowup, skewed shuffle, driver
materialization) — exactly what a 100 TB deployment would hit.

Usage: python stress.py [K] (default 10)
       python stress.py [K] --skew   (skewed-user events mode)

``--skew`` additionally gives ONE user ~10%% of ALL events in the
scaled copy and runs the user_id-partitioned window family
(sessionization / running totals / rolling 1h) — the repo's most
skew-exposed plans. Window partitions do NOT get AQE skew splitting
(that's join-only), so this measures the real straggler cost of a hot
key at 10x data.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def scale_tables(
    spark, src_dir: str, k: int, out_dir: str, skew_events: bool = False
) -> None:
    from pyspark.sql import functions as F

    from deker_server_adapters_spark.sources.tables import TABLES, load_table

    key_cols = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name in TABLES:
        df = load_table(spark, src_dir, name)
        if name in key_cols:
            rep = spark.range(k).select(F.col("id").alias("__rep"))
            scaled = df.crossJoin(rep)
            # shift keys per replica so joins stay 1:1 instead of k:k
            shift = 10_000_000
            for c in key_cols[name]:
                scaled = scaled.withColumn(c, F.col(c) + F.col("__rep") * shift)
            if name == "events":
                # spread replicas in time so sessions/windows stay
                # realistic (loader always yields timestamp ts now)
                scaled = scaled.withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.unix_micros("ts") + F.col("__rep") * F.lit(86_400_000_000)
                    ),
                )
            if name == "documents":
                # make replica texts distinct so dedup has k-sized groups
                scaled = scaled.withColumn(
                    "text", F.concat(F.col("text"), F.lit(" rep"), F.col("__rep"))
                )
            if name == "events" and skew_events:
                # ONE hot user owns ~10% of all events across every
                # replica — deterministic gate so reruns see the same
                # skew
                scaled = scaled.withColumn(
                    "user_id",
                    F.when(
                        F.expr("pmod(xxhash64(event_id), 10) = 0"), F.lit(424242)
                    ).otherwise(F.col("user_id")),
                )
            scaled = scaled.drop("__rep")
        else:
            scaled = df
        scaled.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def _force(df) -> None:
    """Evaluate EVERY output column: a bare count() lets Catalyst prune
    projection-only operators (a trailing Window with no downstream
    consumer disappears entirely), silently timing just the scan."""
    from pyspark.sql import functions as F

    df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def run(ops, spark, sf_dir) -> dict[str, float]:
    timings = {}
    for name, op in ops.items():
        _force(op.builder(spark, sf_dir))  # warm codegen
        t0 = time.perf_counter()
        _force(op.builder(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in sys.argv[1:]
    k = int(args[0]) if args else 10
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from deker_server_adapters_spark.operators import all_ops
    from deker_server_adapters_spark.session import get_spark

    spark = get_spark(app_name="deker-spark-stress")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="deker_stress_")
    scale_tables(spark, base, k, out_dir, skew_events=skew)

    explicit = os.environ.get("SPARK_GRAFT_STRESS_OPS")
    if explicit:
        ops = {n: all_ops()[n] for n in explicit.split(",") if n}
    elif skew:
        window_family = (
            "events_sessionization",
            "events_running_totals",
            "events_rolling_1h",
        )
        ops = {n: all_ops()[n] for n in window_family}
    else:
        ops = {n: o for n, o in all_ops().items() if o.headline}
    t1 = run(ops, spark, base)
    tk = run(ops, spark, out_dir)
    report = {
        "k": k,
        "skew": skew,
        "base_sec": t1,
        "scaled_sec": tk,
        "ratio": {n: round(tk[n] / max(t1[n], 1e-3), 1) for n in ops},
    }
    sys.stdout.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
