"""Operator registry.

Each operator module exposes ``OPS: dict[str, Op]``. ``Op.builder`` is a
``(spark, sf_dir) -> DataFrame`` callable (idiomatic DataFrame API);
``Op.oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet for
the driver's correctness gate (None for non-SQL-expressible ops).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Op:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    headline: bool = False  # included in bench.py
    # semantics note surfaced to registry consumers (e.g. "approximate:
    # candidate recall ~0.89/pair at the threshold angle"); None = exact
    description: Optional[str] = None


def all_ops() -> dict[str, "Op"]:
    from deker_server_adapters_spark.operators import (
        arrays,
        dedup,
        events,
        multimodal,
        similarity,
        text,
        tpch,
    )

    # The driver checks a bounded number of queries per round in registry
    # order, so rotate: ops with the OLDEST driver CORRECTNESS row lead.
    # r3 rotation — the 16 tpch ops whose last row is r1 (they trailed the
    # r2 registry) go first; everything else follows in module order.
    merged: dict[str, Op] = {}
    for mod in (text, arrays, multimodal, similarity, dedup, events, tpch):
        for name, op in mod.OPS.items():
            if name in merged:
                raise ValueError(f"duplicate operator name {name!r}")
            merged[name] = op
    r1_only = [
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q9_product_profit",
        "q10_returned_items",
        "q12_priority_shipping",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q16_brand_supplier_counts",
        "q18_large_orders",
        "q19_discounted_revenue",
        "q22_global_sales_opportunity",
        "customer_order_rollup",
        "customer_order_cube",
        "customers_without_orders",
        "repeat_buyers",
        "top_parts_per_brand",
    ]
    lead = {n: merged[n] for n in r1_only if n in merged}
    rest = {n: op for n, op in merged.items() if n not in lead}
    return {**lead, **rest}
