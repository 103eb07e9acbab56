"""Registry rotation: order is DERIVED from the driver's own
CORRECTNESS_r*.json output — stalest (and broken) ops lead, so the
driver's bounded per-round check window cycles through everything."""

from __future__ import annotations

import json


def test_last_green_round_parses_and_skips_failures(tmp_path):
    from deker_server_adapters_spark.operators import _last_green_round

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "op_a": {"hash_match": True, "err": None},
        "op_b": {"hash_match": True, "err": None},
        "op_c": {"hash_match": None, "spark_rows": 5, "err": "no_oracle"},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "op_a": {"hash_match": True, "err": None},
        "op_b": {"hash_match": None, "err": "AnalysisException: boom"},  # broken r2
        "op_d": {"hash_match": False, "err": None},  # value mismatch
        # rows-only op that produced ZERO rows: ran, but proved nothing
        "op_e": {"hash_match": None, "spark_rows": 0, "err": "no_oracle"},
    }))
    (tmp_path / "garbage.json").write_text("not correctness")
    (tmp_path / "CORRECTNESS_r03.json").write_text("{ truncated")  # unreadable

    green = _last_green_round(tmp_path)
    assert green["op_a"] == 2
    assert green["op_b"] == 1  # r2 failure must NOT advance it
    assert green["op_c"] == 1  # rows-only-by-design counts as checked
    assert "op_d" not in green  # never green -> maximally stale
    assert "op_e" not in green  # rows-only with 0 rows proves nothing

    # the ordering contract the driver's check window depends on:
    # never-green/broken first, then ascending last-green round
    names = ["op_a", "op_b", "op_c", "op_d", "op_e"]
    ordered = sorted(names, key=lambda n: green.get(n, -1))
    assert set(ordered[:2]) == {"op_d", "op_e"}  # maximally stale lead
    assert ordered[-1] == "op_a"  # freshest green last


def test_all_ops_orders_stale_first():
    from deker_server_adapters_spark.operators import _last_green_round, all_ops
    from pathlib import Path

    green = _last_green_round(Path(__file__).resolve().parents[1])
    names = list(all_ops())
    ranks = [green.get(n, -1) for n in names]
    assert ranks == sorted(ranks)  # never-checked/broken lead, freshest last


def test_operator_catalog_is_current():
    """docs/OPERATORS.md must match what the generator renders from the
    live registry — a stale catalog misdocuments the API surface."""
    from pathlib import Path

    from deker_server_adapters_spark.catalog import render

    on_disk = Path("docs/OPERATORS.md").read_text()
    assert on_disk == render(), (
        "docs/OPERATORS.md is stale; run python -m deker_server_adapters_spark.catalog"
    )
