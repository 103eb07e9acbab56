"""Operator registry.

Each operator module exposes ``OPS: dict[str, Op]``. ``Op.builder`` is a
``(spark, sf_dir) -> DataFrame`` callable (idiomatic DataFrame API);
``Op.oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet for
the driver's correctness gate (None for non-SQL-expressible ops).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from pathlib import Path
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


def _last_green_round(repo_root: Path) -> dict[str, int]:
    """Per-op latest round with a PASSING driver correctness row.

    Parses the ``CORRECTNESS_r*.json`` files the driver drops at the
    repo root. A row counts as green if its value hash matched, or if
    the op is rows-only by design (``err == "no_oracle"``) and its
    Spark side produced rows. Errored/mismatched rows do NOT advance
    the op — a broken op stays maximally stale so the next rotation
    fronts it for re-verification.
    """
    green: dict[str, int] = {}
    for p in repo_root.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            )
            if ok:
                green[name] = max(green.get(name, 0), rnd)
    return green


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

    merged: dict[str, Op] = {}
    for mod in (text, arrays, multimodal, similarity, dedup, events, tpch):
        for name, op in mod.OPS.items():
            if name in merged:
                raise ValueError(f"duplicate operator name {name!r}")
            merged[name] = op
    # The driver checks a bounded window of queries per round in
    # registry order, so rotate: stalest ops lead. Staleness is derived
    # from the driver's own CORRECTNESS_r*.json output (no
    # hand-maintained list): never-green and last-round-broken ops
    # first, then ascending by last green round; module order breaks
    # ties (Python's sort is stable).
    last_green = _last_green_round(Path(__file__).resolve().parents[2])
    return dict(sorted(merged.items(), key=lambda kv: last_green.get(kv[0], -1)))
