"""Headline-query benchmark.

Runs the headline operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full execution with a count() over the final
plan (no collect of wide results — we time the engine, not the
driver's row materialization).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from deker_server_adapters_spark.operators import all_ops
    from deker_server_adapters_spark.session import get_spark

    spark = get_spark(app_name="deker-spark-bench", shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    ops = {name: op for name, op in all_ops().items() if op.headline}

    # One warmup execution per query: whole-stage-codegen classes are
    # compiled per unique expression tree, so timing the first run
    # measures the JIT, not the engine. The measured passes report
    # steady-state throughput (codegen cache hot, OS page cache warm —
    # the regime a long-lived cluster actually runs in).
    for op in ops.values():
        op.builder(spark, sf_dir).count()

    # Min of N timed passes per query: a single pass on a shared box
    # measures the neighbors as much as the plan (r5 drifted ~13%
    # uniformly from background load). The min is the best estimate of
    # the plan's intrinsic cost; pass count is env-tunable.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name, op in ops.items():
        samples: list[float] = []
        for _ in range(passes):
            t0 = time.perf_counter()
            op.builder(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)

    # Materialization-honest column (r14 verdict item 5): count() lets
    # Catalyst prune unprojected columns and their producing work — the
    # historical columns above keep that protocol for cross-round
    # comparability, while this column forces EVERY output column to be
    # computed via a hash-all-columns aggregate (xxhash64 over the full
    # row, summed to one row — so driver-side row materialization still
    # stays out of the timing). A query whose two numbers diverge
    # meaningfully does real work count() was pruning; docs/PERF.md
    # reads the divergence per round.
    from pyspark.sql import functions as F

    materialized: dict[str, float] = {}

    def _hashable(df, c):
        # xxhash64 rejects MapType (and map-bearing nests) with an
        # AnalysisException — route those through to_json so a future
        # map-emitting headline op degrades to a still-total hash
        # instead of crashing the whole bench run (r15 advice)
        t = df.schema[c].dataType.simpleString()
        col = F.col(c)
        return F.to_json(col) if "map<" in t else col

    def mat_run(op) -> float:
        # time from builder invocation, exactly like the count()
        # column: iterative ops (connected components, trainers) do
        # driver-side rounds INSIDE the builder, which an action-only
        # timer would silently exclude
        t0 = time.perf_counter()
        df = op.builder(spark, sf_dir)
        h = F.xxhash64(*[_hashable(df, c) for c in df.columns])
        # bit_xor: overflow-free fold (sum of longs trips ANSI mode)
        df.select(h.alias("h")).agg(F.expr("bit_xor(h)")).collect()
        return time.perf_counter() - t0

    for name, op in ops.items():
        mat_run(op)  # separate warmup: distinct plan from count()
        materialized[name] = round(min(mat_run(op) for _ in range(passes)), 3)

    # Calibration query (r12, the bench-noise verdict item): fixed
    # CPU-bound work with a trivial plan (sum over a range — no I/O, no
    # shuffle, no data dependence), same warmup + min-of-passes
    # protocol. Box drift moves raw seconds and the calibration
    # together, so the calibrated column (raw / calib) is comparable
    # ACROSS rounds on a drifting shared box; docs/PERF.md's noise rule
    # reads that column first.
    # Two protocol traps found and fixed while landing this (r12):
    # (a) count() over the global aggregate references no columns, so
    # the summed work can be pruned — collect() pins it; (b) repeated
    # actions on the SAME DataFrame reuse the materialized shuffle map
    # outputs (the aggregate's stage 0 is skipped on re-run), so the
    # timed passes were reading 32 cached rows — rebuild the plan per
    # pass, exactly as the headline loop rebuilds each query. The
    # summand is bounded (id % 1000) so the calibration range can be
    # scaled freely: sum(id) overflows BIGINT under ANSI mode once the
    # range passes ~4.3e9 rows (n^2/2 > 2^63).
    def calib_run() -> float:
        df = spark.range(4_000_000_000).selectExpr("sum(id % 1000) AS s")
        t0 = time.perf_counter()
        df.collect()
        return time.perf_counter() - t0

    calib_run()  # warmup (codegen compile)
    calib_samples = [calib_run() for _ in range(passes)]
    calib = round(min(calib_samples), 3)
    calib_median = round(statistics.median(calib_samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration_sec": calib,
        "queries_calibrated": {
            name: round(sec / calib, 2) for name, sec in timings.items()
        },
        # Median-of-passes (r13 verdict item 7): cross-round reads should
        # quote a median, not a single shot — the min stays the standing
        # comparable column; the median columns carry the robust read.
        "calibration_median_sec": calib_median,
        "queries_median": medians,
        "queries_median_calibrated": {
            name: round(sec / calib_median, 2) for name, sec in medians.items()
        },
        # min-of-passes under the hash-all-columns action (see above)
        "queries_materialized": materialized,
        "queries_materialized_calibrated": {
            name: round(sec / calib, 2) for name, sec in materialized.items()
        },
    }
    sys.stdout.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
