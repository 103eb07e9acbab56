"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 to a ``(spark, sf_dir) ->
DataFrame`` builder; ``oracle_sql()`` gives each one's DuckDB twin for
the correctness gate (ops without a SQL-expressible form are omitted
there and get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from deker_server_adapters_spark.operators import all_ops


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from deker_server_adapters_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: op.builder for name, op in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    return {name: op.oracle for name, op in all_ops().items() if op.oracle is not None}


def descriptions() -> dict[str, str]:
    """Semantics notes for registry consumers (approximate ops declare
    their recall so a caller knows the answer is candidate-bounded)."""
    return {
        name: op.description
        for name, op in all_ops().items()
        if op.description is not None
    }
