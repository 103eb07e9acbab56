"""Format round-trips: parquet (partitioned, pruned), CSV, JSON —
lossless including microsecond timestamps."""

from __future__ import annotations

from pyspark.sql import functions as F

from deker_server_adapters_spark.sources import io
from deker_server_adapters_spark.sources.tables import load_table


def _sorted_pdf(df, keys):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


def test_register_views_sql_interface(spark, sf_dir):
    """spark.sql over the registered views — the SQL front door."""
    from deker_server_adapters_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT n_name, count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 5
        """
    )
    rows = df.collect()
    assert len(rows) == 5 and rows[0]["n_customers"] >= rows[-1]["n_customers"]


def test_parquet_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_parquet")
    io.write_parquet(ev, path, partition_by=["event_type"])
    back = io.read_parquet(spark, path)
    assert back.count() == ev.count()
    # partition pruning: filtering on the partition key scans 1 dir
    from deker_server_adapters_spark.plans.explain import formatted_plan

    pruned = back.filter(F.col("event_type") == "purchase")
    assert pruned.count() == ev.filter(F.col("event_type") == "purchase").count()
    assert "PartitionFilters: [isnotnull(event_type" in formatted_plan(pruned)


def test_csv_roundtrip_micros(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_csv")
    io.write_csv(ev, path)
    back = io.read_csv(spark, path, ev.schema)
    a = _sorted_pdf(ev, ["event_id"])
    b = _sorted_pdf(back.select(*ev.columns), ["event_id"])
    assert a.equals(b)


def test_json_roundtrip_micros(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_json")
    io.write_json(ev, path)
    back = io.read_json(spark, path, ev.schema)
    a = _sorted_pdf(ev, ["event_id"])
    b = _sorted_pdf(back.select(*ev.columns), ["event_id"])
    assert a.equals(b)
