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

    # Ordered so ops without a driver CORRECTNESS row yet run first: the
    # driver checks a bounded number of queries per round in registry order,
    # so text/arrays/multimodal/similarity (unchecked in r1) lead and the
    # already-green tpch/events/dedup queries trail as regression checks.
    merged: dict[str, Op] = {}
    for mod in (text, arrays, multimodal, similarity, dedup, events, tpch):
        for name, op in mod.OPS.items():
            if name in merged:
                raise ValueError(f"duplicate operator name {name!r}")
            merged[name] = op
    return merged
