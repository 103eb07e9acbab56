"""Tie-safe rounding audit — the r10-verdict gate that makes the
decimal-half-tie hazard class un-reintroducible.

The class: Spark's native ``round(double, d)`` goes through BigDecimal
HALF_UP on the value's shortest decimal rendering while DuckDB scales
the binary double, so a non-dyadic double whose rendering terminates in
``…5`` at digit d+1 rounds DIFFERENTLY across engines (the r9
``nation_order_value_quantiles`` red row). Every oracled op must
therefore route final-output double rounding through
``functions.histogram.round_ties_safe`` / ``round_ties_safe_sql``
(identical IEEE ops in both engines), with exactly three native-round
exemptions, each tie-safe by construction:

1. single-argument round-to-integer — a shortest rendering of ``X.5``
   implies the double IS exactly X.5 (dyadic, exactly representable),
   where both engines round half away from zero alike;
2. rounding of a DECIMAL-typed expression — base-10-exact value, both
   engines apply HALF_UP to the same exact decimal;
3. a site annotated ``native-round-ok`` carrying its own proof (used
   for decimal-typed columns whose call text doesn't mention the type).

The audit walks every registered op: the ORACLE side scans the rendered
DuckDB SQL for native ``round(`` calls; the SPARK side scans the
builder's transitive in-package source closure (the same closure the
fingerprint rotation uses, so shared helpers are covered once per op
that reaches them) for ``F.round(`` calls. Rows-only ops (oracle None)
are exempt — there is no second engine to diverge from — except where
their helpers are shared with an oracled op, in which case the oracled
op's closure scan covers them. Known evasion (documented, accepted):
a native ``round(`` inside a multi-line ``F.expr`` string constant is
only caught when ``F.expr`` and ``round(`` share a source line.
"""

from __future__ import annotations

import inspect
import re

import pytest

from deker_server_adapters_spark.operators import _captured_sources, all_ops

_OPS = all_ops()
_ORACLED = [(name, op) for name, op in _OPS.items() if op.oracle is not None]

_MARKER = "native-round-ok"


def _call_text(src: str, start: int) -> str:
    """Balanced-paren call text starting at the '(' at/after `start`."""
    i = src.index("(", start)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "(":
            depth += 1
        elif src[j] == ")":
            depth -= 1
            if depth == 0:
                return src[i : j + 1]
    return src[i:]


def _top_level_comma(call: str) -> bool:
    depth = 0
    for ch in call:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 1:
            return True
    return False


def _sql_violations(sql: str) -> list[str]:
    out = []
    for m in re.finditer(r"(?<![_a-zA-Z])round\(", sql):
        call = _call_text(sql, m.start())
        if not _top_level_comma(call):
            continue  # single-arg round-to-integer: tie-safe
        up = call.upper()
        if "DECIMAL" in up and "AS DOUBLE" not in up:
            continue  # pure decimal arithmetic: base-10-exact
        if _MARKER in sql[max(0, m.start() - 120) : m.start()]:
            continue  # annotated with its own proof
        out.append(call.replace("\n", " ")[:120])
    return out


def _spark_violations(closure_src: str) -> list[str]:
    out = []
    lines = closure_src.split("\n")
    # line-start offsets to map match positions back to lines
    offsets, pos = [], 0
    for ln in lines:
        offsets.append(pos)
        pos += len(ln) + 1
    for m in re.finditer(r"F\.round\(", closure_src):
        call = _call_text(closure_src, m.start())
        if not _top_level_comma(call):
            continue
        low = call.lower()
        if "decimal" in low and 'cast("double")' not in low:
            continue
        # marker on the call's line or up to 3 lines above
        lineno = max(i for i, off in enumerate(offsets) if off <= m.start())
        ctx = "\n".join(lines[max(0, lineno - 3) : lineno + 1])
        if _MARKER in ctx:
            continue
        out.append(call.replace("\n", " ")[:120])
    # SQL-string rounds reaching Spark through F.expr (single-line form)
    for ln in lines:
        if "F.expr" in ln and re.search(r"(?<![_a-zA-Z.])round\(", ln) and _MARKER not in ln:
            out.append(ln.strip()[:120])
    return out


@pytest.mark.parametrize("name", [n for n, _ in _ORACLED])
def test_oracle_sql_native_round_audit(name):
    bad = _sql_violations(_OPS[name].oracle)
    assert not bad, (
        f"{name}: native round() on a (possibly) double-typed oracle "
        f"output — use round_ties_safe_sql or annotate {_MARKER}: {bad}"
    )


@pytest.mark.parametrize("name", [n for n, _ in _ORACLED])
def test_builder_native_round_audit(name):
    op = _OPS[name]
    try:
        src = inspect.getsource(op.builder)
    except (OSError, TypeError):
        src = ""
    closure = "\n".join([src] + _captured_sources(op.builder, set()))
    bad = _spark_violations(closure)
    assert not bad, (
        f"{name}: native F.round on a (possibly) double-typed column in "
        f"the builder closure — use round_ties_safe or annotate "
        f"{_MARKER}: {bad}"
    )


def test_audit_rules_fire_on_known_bad_patterns():
    """The audit itself must reject the exact r9 red-row construction
    and accept each documented exemption."""
    # rejected: two-arg round of an interpolated double
    assert _sql_violations("SELECT round(quantile_cont(v, 0.5), 4) AS p")
    assert _spark_violations('F.round(F.expr("percentile(v, 0.5)"), 4)')
    # rejected: decimal laundered through AS DOUBLE before the round
    assert _sql_violations(
        "round(CAST(sum(CAST(v AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4)"
    )
    assert _spark_violations(
        'F.round(F.sum(c.cast("decimal(30,6)")).cast("double") / F.count(c), 4)'
    )
    # accepted: single-arg, pure-decimal, and annotated forms
    assert not _sql_violations("SELECT CAST(round(x * s) AS INT)")
    assert not _sql_violations("round(sum(CAST(v AS DECIMAL(30,6))), 2)")
    assert not _sql_violations("/* native-round-ok: DECIMAL */ round(vd, 2)")
    assert not _spark_violations("F.round(x.cast('double') * scale)")
    assert not _spark_violations('F.round(F.sum(c.cast("decimal(30,6)")), 2)')
    assert not _spark_violations(
        "# native-round-ok: rv is DECIMAL\nF.round(F.col('rv'), 2)"
    )
