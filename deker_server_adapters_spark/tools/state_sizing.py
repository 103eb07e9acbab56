"""Measure state-store footprint of the stateful streaming twins under
the RocksDB provider (SURVEY §7 / VERDICT r7 item 7).

Runs each stateful twin over the sf events table split into micro-
batches, on the RocksDB state-store provider, and reports the final
``stateOperators`` progress metrics: state rows, bytes in memory,
RocksDB SST bytes on disk, and derived bytes/key — the numbers a
100 TB operator needs to size executor memory and local disks for each
op. Results land in docs/PERF.md.

    python -m deker_server_adapters_spark.tools.state_sizing [sf_dir]
"""

from __future__ import annotations

import json
import sys


def _run_and_size(stream_df, mode: str, checkpoint_prefix: str, extra: dict) -> dict:
    """Drain a stateful stream into a noop sink on a FRESH scratch
    checkpoint (r12 advice: a fixed /tmp path made a second measure()
    in one process resume a stale checkpoint and report an empty
    state row) and extract the per-key sizing numbers from the final
    ``stateOperators`` progress."""
    from deker_server_adapters_spark.sources.scratch import scratch_dir

    q = (
        stream_df.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", scratch_dir(checkpoint_prefix))
        .start()
    )
    try:
        q.processAllAvailable()
        prog = q.lastProgress
    finally:
        q.stop()
    ops = (prog or {}).get("stateOperators") or []
    if not ops:
        return {"error": "no stateOperators progress"}
    so = ops[0]
    custom = so.get("customMetrics") or {}
    rows = so.get("numRowsTotal", 0)
    mem = so.get("memoryUsedBytes", 0)
    sst = custom.get("rocksdbSstFileSize", 0)
    return {
        "operator": so.get("operatorName"),
        **extra,
        "state_rows": rows,
        "memory_used_bytes": mem,
        "rocksdb_sst_bytes": sst,
        "rocksdb_total_memory_bytes": custom.get("rocksdbTotalMemoryUsage"),
        "bytes_per_key_mem": round(mem / rows, 1) if rows else None,
        "bytes_per_key_sst": round(sst / rows, 1) if rows else None,
    }


def measure(spark, sf_dir: str, n_files: int = 4) -> dict:
    from deker_server_adapters_spark.streaming.events_stream import (
        stream_events_source,
        streaming_cms_sketch,
        streaming_funnel,
        streaming_hll_registers,
        streaming_inactivity_alerts,
        streaming_inter_arrival,
        streaming_retention,
        streaming_running_totals,
        streaming_value_histogram,
    )

    twins = {
        # twin -> (builder, writeStream outputMode)
        "funnel": (streaming_funnel, "update"),
        "retention": (streaming_retention, "append"),
        "inter_arrival": (streaming_inter_arrival, "update"),
        "running_totals": (streaming_running_totals, "append"),
        "cms_sketch": (streaming_cms_sketch, "update"),
        "inactivity_alerts": (streaming_inactivity_alerts, "append"),
        "hll_registers": (streaming_hll_registers, "update"),
        "value_histogram": (
            lambda ev: streaming_value_histogram(ev, 0.0, 250.0),
            "update",
        ),
    }
    out: dict = {}
    out["threshold_join"] = _measure_threshold_join(spark, sf_dir, n_files)
    out["incremental_dedup"] = _measure_incremental_dedup(spark, sf_dir)
    out["semantic_dedup"] = _measure_semantic_dedup(spark, sf_dir, n_files)
    for name, (builder, mode) in twins.items():
        src = stream_events_source(spark, sf_dir, n_files=n_files)
        out[name] = _run_and_size(
            builder(src), mode, f"deker_state_sizing_{name}_", {}
        )
    return out


def _measure_threshold_join(spark, sf_dir: str, n_files: int) -> dict:
    """State footprint of the streaming LSH threshold join (r11): the
    index holds ``tables`` copies of the corpus in per-cell state, so
    bytes/key here prices the whole streaming-ANN memory budget."""
    from deker_server_adapters_spark.sources.tables import load_table
    from deker_server_adapters_spark.streaming.similarity_stream import (
        stream_embeddings_source,
        streaming_threshold_join,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    src = stream_embeddings_source(spark, sf_dir, n_files=n_files)
    return _run_and_size(
        streaming_threshold_join(src, n_hint=n),
        "append",
        "deker_state_sizing_tj_",
        {"n_vectors": n},
    )


def _measure_semantic_dedup(spark, sf_dir: str, n_files: int) -> dict:
    """State footprint of the streaming hybrid semantic dedup (r13):
    cluster-cell rows hold ~n/k embeddings each and LSH rows the
    occupancy-capped bucket contents, so bytes/key here prices keeping
    the SemDeDup index resident as stream state."""
    from deker_server_adapters_spark.sources.tables import load_table
    from deker_server_adapters_spark.streaming.similarity_stream import (
        stream_embeddings_source,
        streaming_semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    src = stream_embeddings_source(spark, sf_dir, n_files=n_files)
    return _run_and_size(
        streaming_semantic_dedup(src, n_hint=n, ref_emb=emb),
        "append",
        "deker_state_sizing_sem_",
        {"n_vectors": n},
    )


def _measure_incremental_dedup(spark, sf_dir: str) -> dict:
    """State footprint of the streaming incremental dedup (r12): the
    corpus index = one exact-hash row per distinct old text plus
    n_bands (band-key -> ids + full signatures) rows, so bytes/key here
    prices keeping yesterday's deduped corpus resident as stream
    state."""
    from deker_server_adapters_spark.sources.tables import load_table
    from deker_server_adapters_spark.streaming.dedup_stream import (
        stream_documents_source,
        streaming_incremental_dedup,
    )

    n = load_table(spark, sf_dir, "documents").count()
    src = stream_documents_source(spark, sf_dir, n_new_files=2)
    return _run_and_size(
        streaming_incremental_dedup(src),
        "append",
        "deker_state_sizing_incr_",
        {"n_docs": n},
    )


def main() -> None:
    from deker_server_adapters_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="deker-state-sizing")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    print(json.dumps({"sf_dir": sf_dir, "twins": measure(spark, sf_dir)}, indent=2))


if __name__ == "__main__":
    main()
