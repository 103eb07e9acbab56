"""Scale utilities: salted joins/aggs equal their plain forms; bucketed
joins run shuffle-free; approx distinct lands within its error bound."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from deker_server_adapters_spark.plans.explain import physical_plan
from deker_server_adapters_spark.plans.skew import salted_count_distinct, salted_join
from deker_server_adapters_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, "l_orderkey").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, orders, "l_orderkey", salt_n=8)
        .groupBy("o_orderpriority")
        .count()
    )
    a = {r["o_orderpriority"]: r["count"] for r in plain.collect()}
    b = {r["o_orderpriority"]: r["count"] for r in salted.collect()}
    assert a == b


def test_salted_count_distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    salted = {
        r["event_type"]: r["n_distinct"]
        for r in salted_count_distinct(ev, "event_type", "user_id", salt_n=8).collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from deker_server_adapters_spark.sources.bucketing import bucketed, save_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt'")
    # at test scale the planner prefers a broadcast (also shuffle-free
    # but it hides bucketing); force the big-big regime a 100 TB join
    # would be in
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        save_bucketed(li, "bkt.li_b", ["l_orderkey"], num_buckets=8)
        save_bucketed(orders, "bkt.orders_b", ["o_orderkey"], num_buckets=8)
        joined = bucketed(spark, "bkt.li_b").join(
            bucketed(spark, "bkt.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_approx_quantiles_within_bound(spark, sf_dir):
    from deker_server_adapters_spark.operators.events import (
        events_approx_quantiles,
        events_value_percentiles,
    )

    exact = events_value_percentiles(spark, sf_dir).toPandas().set_index("event_type")
    approx = events_approx_quantiles(spark, sf_dir).toPandas().set_index("event_type")
    for t in exact.index:
        for q in ("p50", "p90"):
            rel = abs(approx.loc[t, q] - exact.loc[t, q]) / max(abs(exact.loc[t, q]), 1e-9)
            assert rel < 0.1, (t, q, approx.loc[t, q], exact.loc[t, q])


def test_approx_distinct_within_bound(spark, sf_dir):
    from deker_server_adapters_spark.operators.events import (
        events_approx_distinct_users,
        events_distinct_users_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in events_approx_distinct_users(spark, sf_dir).collect()
    }
    for t, n in exact.items():
        assert abs(approx[t] - n) / n < 0.05, (t, n, approx[t])


def test_zorder_layout_tightens_both_dims(spark, sf_dir):
    """Z-order over (user_id, value) must shrink per-partition spans of
    BOTH columns vs a single-column range layout (which leaves the
    other column's span at ~full range) — that span is exactly the
    per-file min/max a parquet scan prunes on."""
    from pyspark.sql import functions as F

    from deker_server_adapters_spark.plans.layout import zorder_layout
    from deker_server_adapters_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    n_parts = 16

    def mean_spans(df):
        spans = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("u_span"),
                (F.max("value") - F.min("value")).alias("v_span"),
            )
            .agg(F.avg("u_span").alias("u"), F.avg("v_span").alias("v"))
            .first()
        )
        return float(spans["u"]), float(spans["v"])

    single = ev.repartitionByRange(n_parts, "user_id")
    zed = zorder_layout(ev, ["user_id", "value"], n_parts)
    u_single, v_single = mean_spans(single)
    u_z, v_z = mean_spans(zed)
    # single-column layout: near-zero user span, near-full value span
    assert v_z < v_single / 2, (v_z, v_single)
    # z-order trades a little user locality for value locality but must
    # still beat the full user range by a wide margin
    full_u = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    assert u_z < full_u / 2, (u_z, full_u)


def test_zvalue_orders_like_morton():
    """The interleaved code must order pure powers correctly: points
    close in both dims get close z-values; the code for (1,0) and
    (0,1) differ only in adjacent bits."""
    from deker_server_adapters_spark.plans.layout import zvalue
    from deker_server_adapters_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(shuffle_partitions=2)
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2)], "a long, b long"
    )
    out = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zvalue([F.col("a"), F.col("b")]).alias("z")
        ).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1  # a is bit 0
    assert out[(0, 1)] == 2  # b is bit 1
    assert out[(1, 1)] == 3
    assert out[(2, 2)] == 12  # next bit pair


def test_compaction_reduces_file_count(spark, tmp_path):
    from deker_server_adapters_spark.plans.layout import (
        compact_files,
        compaction_plan,
    )

    src = str(tmp_path / "many")
    # 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(src)
    n_files, total, parts = compaction_plan(src, target_file_bytes=10**9)
    assert n_files == 40 and total > 0 and parts == 1

    out = str(tmp_path / "compact")
    used = compact_files(spark, src, out, target_file_bytes=10**9)
    assert used == 1
    import glob

    out_files = glob.glob(out + "/*.parquet")
    assert len(out_files) == 1
    assert spark.read.parquet(out).count() == 4000


@pytest.mark.slow
def test_stress_harness_skew_generators(spark, tmp_path):
    """The skew-stress harness must actually produce the distributions
    PERF.md claims it measured: ~10% of lineitems on one hot orderkey
    (which exists on the orders side) and ~10% of events on one hot
    user. Guarded at k=1 so a harness regression can't silently turn
    the skew tables into uniform-measurement theater."""
    import sys

    sys.path.insert(0, "/root/repo")
    from stress import scale_tables

    from pyspark.sql import functions as F

    out = str(tmp_path / "skewed")
    scale_tables(
        spark, "/root/testdata/sf0.001", 1, out, skew_events=True, skew_lineitem=True
    )
    li = spark.read.parquet(out + "/lineitem.parquet")
    total = li.count()
    top = li.groupBy("l_orderkey").count().orderBy(F.desc("count")).first()
    assert 0.05 <= top["count"] / total <= 0.15, (top, total)
    orders = spark.read.parquet(out + "/orders.parquet")
    assert orders.filter(F.col("o_orderkey") == top["l_orderkey"]).count() == 1

    ev = spark.read.parquet(out + "/events.parquet")
    ev_total = ev.count()
    hot = ev.filter(F.col("user_id") == 424242).count()
    assert 0.05 <= hot / ev_total <= 0.15, (hot, ev_total)


@pytest.mark.slow
def test_hybrid_frontier_estimator_anchors_to_registry_recall(spark, sf_dir):
    """The frontier harness's sampled-truth recall estimator
    (tools/hybrid_frontier.py) must reproduce the registry recall op
    EXACTLY with the sample wide open (permille=1000 keeps every lower
    id — zero estimator error by construction), and its Python ladder
    mirror must agree with the engine ladders. This is what licenses
    the ≥30× frontier numbers in docs/PERF.md: the estimator is
    anchored against the oracled op before being trusted where full
    truth is unaffordable."""
    from deker_server_adapters_spark.operators.similarity import (
        dedup_semantic_hybrid_recall,
    )
    from deker_server_adapters_spark.tools.hybrid_frontier import (
        ladder_point,
        sampled_recall,
    )

    want = dedup_semantic_hybrid_recall(spark, sf_dir).first()
    got = sampled_recall(spark, sf_dir, permille=1000)
    assert got["n_true_sampled"] == want["n_true_pairs"]
    assert got["recall_cluster"] == want["recall_cluster"]
    assert got["recall_hybrid"] == want["recall_hybrid"]
    # the Python ladder mirror: floor, the r13 10x point, and the cap
    assert ladder_point(500) == (4, 8)
    assert ladder_point(20_000) == (6, 16)
    assert ladder_point(120_000) == (8, 24)
