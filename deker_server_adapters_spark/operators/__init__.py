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


_PACKAGE_PREFIX = "deker_server_adapters_spark"

# Plain-data module globals whose repr is deterministic per source text;
# changing one (e.g. a CMS depth constant) redefines every op that reads it.
_CONST_TYPES = (str, bytes, int, float, bool, tuple, list, dict, set, frozenset)


def _referenced_names(code) -> set:
    """All global names a code object (and its nested lambdas /
    comprehensions / inner defs) loads."""
    names = set(code.co_names)
    for const in code.co_consts:
        if hasattr(const, "co_names"):  # nested code object
            names |= _referenced_names(const)
    return names


_IMPORT_RE = re.compile(
    r"^\s*from\s+(deker_server_adapters_spark[.\w]*)\s+import\s+"
    r"(\([^)]*\)|[^\n]+)",  # parenthesized (possibly multi-line) or rest-of-line
    re.MULTILINE,
)


def _local_import_targets(src: str):
    """(module, name) pairs for in-package ``from X import Y`` found in
    a source blob. The codebase's dominant helper style imports INSIDE
    the builder body, which binds a local — invisible to the
    globals-walk in ``_captured_sources`` — so these have to be
    resolved from the import statements in the captured text itself
    (the r8 lesson: the globals-only closure missed ``h64`` et al.,
    recreating the exact helper-blindness it was built to close, one
    binding style deeper)."""
    for m in _IMPORT_RE.finditer(src):
        module, names = m.group(1), m.group(2)
        for raw in names.replace("(", " ").replace(")", " ").split(","):
            name = raw.split(" as ")[0].strip()  # target, not its alias
            if name.isidentifier():
                yield module, name


def _capture_one(name: str, val, seen: set) -> list:
    """Capture rules for one referenced value: in-package callables
    contribute their source (and recurse through THEIR references);
    plain-data constants contribute a deterministic repr."""
    out = []
    mod = getattr(val, "__module__", None)
    if callable(val) and isinstance(mod, str) and mod.startswith(_PACKAGE_PREFIX):
        try:
            src = inspect.getsource(val)
        except (OSError, TypeError):
            src = repr(val)
        out.append(f"--helper {name}--\n{src}")
        out.extend(_captured_sources(val, seen))
    elif isinstance(val, (set, frozenset)):
        # set repr is hash-order dependent across interpreter runs
        out.append(f"--const {name}--\n{sorted(val, key=repr)!r}")
    elif isinstance(val, _CONST_TYPES):
        out.append(f"--const {name}--\n{val!r}")
    return out


def _captured_sources(fn, seen: set) -> list:
    """Transitive definition closure of a builder: source text of every
    in-package function/class it references (recursively), plus reprs of
    the plain-data module constants it reads. This is what makes a
    HELPER rewrite change its ops' fingerprints — the r7
    ``text_bpe_merges`` lesson, where the builder body stayed
    byte-identical while ``_bpe_apply_merge``/``bpe_merge_table`` were
    rewritten, so the old builder-only fingerprint missed it. Seen-keys
    are module-qualified so same-named globals in two modules (each
    module has its own ``_TOKENS``) are captured independently."""
    code = getattr(fn, "__code__", None)
    globals_ns = getattr(fn, "__globals__", None)
    if code is None or globals_ns is None:
        return []
    mod_name = globals_ns.get("__name__", "?")
    out = []
    for name in sorted(_referenced_names(code)):
        key = f"{mod_name}.{name}"
        if key in seen or name not in globals_ns:
            continue
        seen.add(key)
        out.extend(_capture_one(name, globals_ns[name], seen))
    return out


def op_fingerprint(op: "Op") -> str:
    """Content fingerprint of an op's DEFINITION: oracle SQL + builder
    source + the builder's transitive in-package helper/constant
    closure. The rotation uses it to detect that an op was redefined
    after its last green driver check — a green row only vouches for
    the text that was checked, so a changed op must re-verify even if
    its name was green recently (r6 `events_heavy_hitters_cms`: rewrite
    hidden behind a stale green round; r7 `text_bpe_merges`: rewrite
    hidden one layer deeper, in helpers the old builder-only hash never
    saw). Two reference styles are followed: module-global names
    (recursively, through the code object's name loads) and in-package
    ``from X import Y`` statements in any captured source text — the
    latter because function-LOCAL imports bind locals the globals walk
    cannot see (the r8 lesson: ``h64`` imported inside builder bodies
    was invisible). Dynamic dispatch through containers of functions
    would still evade both, which the module style deliberately
    avoids."""
    import importlib

    try:
        src = inspect.getsource(op.builder)
    except (OSError, TypeError):
        src = repr(op.builder)
    parts = [op.oracle or "<no-oracle>", "--builder--", src]
    seen: set = set()
    parts.extend(_captured_sources(op.builder, seen))
    # fixpoint over in-package imports appearing in ANY captured text
    # (builder + helpers, transitively): resolve each target and apply
    # the same capture rules
    idx = 0
    while idx < len(parts):
        text = parts[idx]
        idx += 1
        for module, name in _local_import_targets(text):
            key = f"{module}.{name}"
            if key in seen:
                continue
            seen.add(key)
            try:
                val = getattr(importlib.import_module(module), name)
            except Exception:
                parts.append(f"--import {key}: unresolved--")
                continue
            parts.append(f"--import {key}--")
            parts.extend(_capture_one(name, val, seen))
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


# rows-only ops sort after every oracled op (r13): the driver's window
# check for an op without an oracle is only "spark_rows > 0" — near-zero
# information next to a hash-verified row — so a window slot spent on
# one is a slot NOT spent re-certifying an oracled op's values. Their
# real verification lives in pytests (parity/error-bound suites).
_ROWS_ONLY_BASE = 1_000_000


def rotation_rank(
    fingerprint: str,
    verified_fp: Optional[str],
    last_green: int,
    oracled: bool = True,
) -> int:
    """Sort key for the staleness rotation: an op whose current
    fingerprint does not match the last driver-verified one is
    maximally stale (fronts its class) no matter how recently its
    NAME was green; otherwise staleness is the last green round.
    Rows-only ops form a second class behind ALL oracled ops — the
    driver's rows>0 check is too weak to be worth displacing a
    hash-verified slot (their value checks are pytest suites)."""
    base = 0 if oracled else _ROWS_ONLY_BASE
    if verified_fp != fingerprint:
        return base - 1
    return base + last_green


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
                op_fingerprint(kv[1]),
                verified.get(kv[0]),
                last_green.get(kv[0], -1),
                oracled=kv[1].oracle is not None,
            ),
        )
    )
