"""Scale utilities: salted joins/aggs equal their plain forms; bucketed
joins run shuffle-free; approx distinct lands within its error bound."""

from __future__ import annotations

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
