"""Time every streaming twin end-to-end at a given SF (r18, VERDICT
item 9 — the twins were never in the op sweep, so their cost had no
measured baseline). Each drive builds its file-stream source, runs the
query to completion against a memory sink (processAllAvailable — the
exact harness the parity tests use) and stops; one warmup + min of N
timed passes, bench-protocol style; one JSON object to stdout.

    python -m deker_server_adapters_spark.tools.stream_sweep \
        [--sf-dir D] [--passes N] [--only a,b]

Caveat for cross-sweep comparison: a pass times source staging cache
hits, micro-batch scheduling and state-store work together — that IS
the twin's cost shape (the batch ops' sweep deliberately excludes
sink effects via count(); the twins' sink is the memory table their
semantics are defined against).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback


def _drives(spark, sf_dir):
    from deker_server_adapters_spark.operators.events import anomaly_stats_df
    from deker_server_adapters_spark.sources.tables import load_table
    from deker_server_adapters_spark.streaming.dedup_stream import (
        stream_documents_source,
        streaming_incremental_dedup,
    )
    from deker_server_adapters_spark.streaming.events_stream import (
        stream_events_source,
        streaming_anomaly_zscore,
        streaming_cms_sketch,
        streaming_daily_hll_registers,
        streaming_exact_dedup,
        streaming_funnel,
        streaming_hll_registers,
        streaming_inactivity_alerts,
        streaming_inter_arrival,
        streaming_purchase_error_join,
        streaming_retention,
        streaming_running_totals,
        streaming_sessionization,
        streaming_tumbling_window,
        streaming_value_histogram,
        streaming_wau_sliding,
    )
    from deker_server_adapters_spark.streaming.multimodal_stream import (
        stream_assets_source,
        streaming_multimodal_features,
    )
    from deker_server_adapters_spark.streaming.similarity_stream import (
        stream_embeddings_source,
        streaming_semantic_dedup,
        streaming_threshold_join,
    )

    ev = lambda **kw: stream_events_source(spark, sf_dir, **kw)  # noqa: E731
    n_emb = None

    def emb_n():
        nonlocal n_emb
        if n_emb is None:
            n_emb = load_table(spark, sf_dir, "embeddings").count()
        return n_emb

    return {
        "stream_tumbling_window": lambda: (streaming_tumbling_window(ev()), "complete"),
        "stream_running_totals": lambda: (streaming_running_totals(ev()), "append"),
        "stream_exact_dedup": lambda: (streaming_exact_dedup(ev()), "append"),
        "stream_purchase_error_join": lambda: (
            streaming_purchase_error_join(ev()),
            "append",
        ),
        "stream_sessionization": lambda: (streaming_sessionization(ev()), "complete"),
        "stream_funnel": lambda: (streaming_funnel(ev()), "update"),
        "stream_retention": lambda: (streaming_retention(ev()), "append"),
        "stream_anomaly_zscore": lambda: (
            streaming_anomaly_zscore(
                ev(), anomaly_stats_df(load_table(spark, sf_dir, "events"))
            ),
            "append",
        ),
        "stream_wau_sliding": lambda: (streaming_wau_sliding(ev()), "complete"),
        "stream_inter_arrival": lambda: (streaming_inter_arrival(ev()), "update"),
        "stream_cms_sketch": lambda: (streaming_cms_sketch(ev()), "update"),
        "stream_hll_registers": lambda: (streaming_hll_registers(ev()), "update"),
        "stream_daily_hll_registers": lambda: (
            streaming_daily_hll_registers(ev()),
            "update",
        ),
        "stream_value_histogram": lambda: (
            streaming_value_histogram(ev(n_files=4), 0.0, 250.0),
            "update",
        ),
        "stream_inactivity_alerts": lambda: (
            streaming_inactivity_alerts(ev()),
            "append",
        ),
        "stream_threshold_join": lambda: (
            streaming_threshold_join(
                stream_embeddings_source(spark, sf_dir, n_files=3), n_hint=emb_n()
            ),
            "append",
        ),
        "stream_semantic_dedup": lambda: (
            streaming_semantic_dedup(
                stream_embeddings_source(spark, sf_dir, n_files=3),
                n_hint=emb_n(),
                ref_emb=load_table(spark, sf_dir, "embeddings"),
            ),
            "append",
        ),
        "stream_incremental_dedup": lambda: (
            streaming_incremental_dedup(
                stream_documents_source(spark, sf_dir, n_new_files=2)
            ),
            "append",
        ),
        "stream_multimodal_features": lambda: (
            streaming_multimodal_features(stream_assets_source(spark, sf_dir, n_files=3)),
            "append",
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--only", default=None, help="comma-separated subset")
    args = ap.parse_args()

    from deker_server_adapters_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="deker-stream-sweep", shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    drives = _drives(spark, args.sf_dir)
    names = args.only.split(",") if args.only else list(drives)
    out: dict[str, float] = {}
    seq = 0
    for name in names:
        try:
            spark.sparkContext.setJobDescription(f"stream-sweep:{name}")

            def one_pass() -> float:
                nonlocal seq
                seq += 1
                df, mode = drives[name]()
                t0 = time.perf_counter()
                q = (
                    df.writeStream.format("memory")
                    .queryName(f"sweep_{name}_{seq}")
                    .outputMode(mode)
                    .start()
                )
                q.processAllAvailable()
                q.stop()
                return time.perf_counter() - t0

            one_pass()  # warmup (codegen + source staging)
            out[name] = round(min(one_pass() for _ in range(args.passes)), 3)
            print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
        except Exception:
            out[name] = -1.0
            traceback.print_exc(file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "passes": args.passes, "sec": out}))


if __name__ == "__main__":
    main()
