"""Operator registry.

Each operator module exposes ``OPS: dict[str, Op]``. ``Op.builder`` is a
``(spark, sf_dir) -> DataFrame`` callable (idiomatic DataFrame API);
``Op.oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet for
the driver's correctness gate (None for non-SQL-expressible ops).
"""

from __future__ import annotations

import hashlib
import inspect
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


def op_fingerprint(op: "Op") -> str:
    """Content fingerprint of an op's DEFINITION: oracle SQL + builder
    source. The rotation uses it to detect that an op was redefined
    after its last green driver check — a green row only vouches for
    the text that was checked, so a changed op must re-verify even if
    its name was green recently (the r6 `events_heavy_hitters_cms`
    lesson: rewritten + new oracle, but its stale green round kept it
    at the back of the rotation for up to two rounds). Builder source
    via ``inspect`` is best-effort (helpers/constants outside the
    function body aren't captured); oracle text is exact."""
    try:
        src = inspect.getsource(op.builder)
    except (OSError, TypeError):
        src = repr(op.builder)
    payload = (op.oracle or "<no-oracle>") + "\n--builder--\n" + src
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def rotation_rank(fingerprint: str, verified_fp: Optional[str], last_green: int) -> int:
    """Sort key for the staleness rotation: an op whose current
    fingerprint does not match the last driver-verified one is
    maximally stale (-1, fronts the window) no matter how recently its
    NAME was green; otherwise staleness is the last green round."""
    if verified_fp != fingerprint:
        return -1
    return last_green


def _verified_fingerprints(repo_root: Path) -> dict[str, str]:
    """Per-op fingerprint at the time of its last green driver check.

    Maintained by ``tools/sync_fingerprints.py``, run at ROUND START
    (before any edits): for every op green in the newest
    ``CORRECTNESS_r*.json`` it records the current fingerprint — sound
    because the driver checks the round-end committed text, which is
    exactly what the next round starts from."""
    p = repo_root / "VERIFIED_FINGERPRINTS.json"
    try:
        data = json.loads(p.read_text())
    except (OSError, ValueError):
        return {}
    return {k: v for k, v in data.items() if isinstance(v, str)}


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
    # hand-maintained list): never-green, last-round-broken, and
    # REDEFINED-since-last-green ops (fingerprint mismatch) first, then
    # ascending by last green round; module order breaks ties (Python's
    # sort is stable).
    root = Path(__file__).resolve().parents[2]
    last_green = _last_green_round(root)
    verified = _verified_fingerprints(root)
    return dict(
        sorted(
            merged.items(),
            key=lambda kv: rotation_rank(
                op_fingerprint(kv[1]), verified.get(kv[0]), last_green.get(kv[0], -1)
            ),
        )
    )
