"""Regenerate ``docs/OPERATORS.md`` from the live operator registry.

Usage: ``python -m deker_server_adapters_spark.catalog`` (from the repo
root). Keeping the catalog generated — never hand-edited — means it
cannot drift from ``all_ops()``.
"""

from __future__ import annotations

from pathlib import Path


def render() -> str:
    from deker_server_adapters_spark.operators import all_ops

    ops = all_ops()
    fams: dict[str, list] = {}
    for name, op in sorted(ops.items()):
        mod = op.builder.__module__.rsplit(".", 1)[-1]
        fams.setdefault(mod, []).append((name, op))
    lines = [
        "# Operator catalog",
        "",
        "Generated from the live registry (`deker_server_adapters_spark.operators.all_ops()`);",
        "regenerate with `python -m deker_server_adapters_spark.catalog`.",
        "Correctness column: `oracle` = DuckDB value-hash-checked by the driver gate;",
        "`rows-only` = no SQL-expressible oracle by design (iterative / sketch /",
        "binary ops), each covered by a semantics pytest instead.",
        "",
    ]
    for fam in sorted(fams):
        lines.append(f"## {fam} ({len(fams[fam])} ops)")
        lines.append("")
        lines.append("| op | check | notes |")
        lines.append("| --- | --- | --- |")
        for name, op in fams[fam]:
            check = "oracle" if op.oracle else "rows-only"
            desc = (op.description or "").replace("|", "/")
            lines.append(f"| `{name}` | {check} | {desc} |")
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    out = Path(__file__).resolve().parent.parent / "docs" / "OPERATORS.md"
    out.write_text(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
