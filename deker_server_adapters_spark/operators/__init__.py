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
    # r4 rotation — the 16 ops whose last green row is r2 (they trailed the
    # r3 registry) go first; everything else follows in module order.
    merged: dict[str, Op] = {}
    for mod in (text, arrays, multimodal, similarity, dedup, events, tpch):
        for name, op in mod.OPS.items():
            if name in merged:
                raise ValueError(f"duplicate operator name {name!r}")
            merged[name] = op
    r2_only = [
        "q1_pricing_summary",
        "q2_min_price_part",
        "q3_unshipped_revenue",
        "q4_order_priority",
        "q5_local_supplier_volume",
        "q8_market_share",
        "q11_important_parts",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q20_heavy_shippers",
        "q21_last_shippers",
        "order_key_sets",
        "customer_balance_distribution",
        "events_asof_join",
        "events_running_totals",
        "events_top_users",
    ]
    lead = {n: merged[n] for n in r2_only if n in merged}
    rest = {n: op for n, op in merged.items() if n not in lead}
    return {**lead, **rest}
