"""Replicates the driver's correctness gate locally for EVERY
queries()/oracle_sql() pair: row count + schema + value equality
against DuckDB on the same parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deker_server_adapters_spark.operators import all_ops
from tests.oracle_utils import compare, duckdb_con

_OPS = all_ops()
_ORACLE_OPS = [name for name, op in _OPS.items() if op.oracle is not None]

# slow tier (r18): these ops' oracle twins replay multi-stage ladders /
# trainers and each costs 15-60 s — together ~45% of the module's wall
# time for 7 of 190 tests. They stay runnable via `pytest -m slow`;
# the driver's own rotating 50-query oracle gate also samples them.
_SLOW_ORACLE = {
    "dedup_semantic_hybrid",
    "dedup_semantic_hybrid_recall",
    "dedup_semantic_hybrid_sharded",
    "dedup_semantic_hybrid_sharded_recall",
    "dedup_semantic_incremental",
    "embeddings_knn_label_check",
    "ann_threshold_join_recall",
}
_ORACLE_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
    for n in _ORACLE_OPS
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_PARAMS)
def test_oracle_parity(spark, sf_dir, duck, name):
    op = _OPS[name]
    spark_df = op.builder(spark, sf_dir)
    duck_df = duck.execute(op.oracle).fetchdf()
    ok, msg = compare(spark_df, duck_df)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize(
    "name", [name for name, op in _OPS.items() if op.oracle is None]
)
def test_rows_only_ops_run(spark, sf_dir, name):
    df = _OPS[name].builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_pack_tokenization_cross_engine(spark):
    """Per-doc token counts must agree Spark-vs-DuckDB EXACTLY at the
    driver's correctness SF: one token of drift in any doc cascades
    through every later doc's token_offset in docs_pack_sequences, so
    this isolates tokenizer divergence from the prefix-sum/window logic
    (VERDICT r5 item 1a)."""
    from deker_server_adapters_spark.operators.text import _TOKENS, _TOKENS_DUCK
    from deker_server_adapters_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    con = duckdb_con(sf)
    try:
        duck = dict(
            con.execute(
                f"SELECT doc_id, CAST(len({_TOKENS_DUCK}) AS BIGINT)"
                " FROM documents"
            ).fetchall()
        )
    finally:
        con.close()
    sp = dict(
        load_table(spark, sf, "documents")
        .select("doc_id", F.expr(f"CAST(size({_TOKENS}) AS BIGINT)"))
        .collect()
    )
    assert set(sp) == set(duck), "doc_id sets differ"
    mism = {d: (sp[d], duck[d]) for d in sp if sp[d] != duck[d]}
    assert not mism, f"{len(mism)} token-count mismatches, e.g. {list(mism.items())[:5]}"


def test_pack_sequences_parity_at_sf001(spark):
    """docs_pack_sequences value-parity pinned at sf0.01 (the driver's
    correctness SF) regardless of the suite's SF — the r5 driver-red
    row; its root cause (HUGEINT→float64 oracle dtype leak) is now
    also caught structurally by compare()'s type-kind gate."""
    op = _OPS["docs_pack_sequences"]
    con = duckdb_con("/root/testdata/sf0.01")
    try:
        ok, msg = compare(op.builder(spark, "/root/testdata/sf0.01"),
                          con.execute(op.oracle).fetchdf())
    finally:
        con.close()
    assert ok, msg


def test_rolling_1h_parity_at_sf001(spark):
    """events_rolling_1h value-parity pinned at sf0.01 regardless of
    the suite's SF: its RANGE frame orders by unix_micros(ts) only, so
    ts-tied peers must share frames identically in both engines — the
    denser sf0.01 events table actually exercises ties (VERDICT r4
    item 7)."""
    op = _OPS["events_rolling_1h"]
    con = duckdb_con("/root/testdata/sf0.01")
    try:
        ok, msg = compare(op.builder(spark, "/root/testdata/sf0.01"),
                          con.execute(op.oracle).fetchdf())
    finally:
        con.close()
    assert ok, msg


def test_round_half_tie_cross_engine_regression(spark):
    """Pinned r9 driver-red regression: NATION_12's sf0.01 median
    estimate is the bit-identical double 265367.6184375 in both
    engines, and the engines' NATIVE round(x, 6) then DISAGREES —
    Spark (BigDecimal HALF_UP on the decimal rendering) says
    ...618438, DuckDB (binary-double scaling) says ...618437. The
    shared tie-safe rounding (functions/histogram.round_ties_safe /
    round_ties_safe_sql) must agree bit-for-bit on exactly this value,
    and on a money-grid probe of other decimal-halfway renderings."""
    import duckdb

    from deker_server_adapters_spark.functions.histogram import (
        round_ties_safe,
        round_ties_safe_sql,
    )

    tie = 265367.6184375
    con = duckdb.connect()
    try:
        # 1) the hazard is real: native rounds disagree on the tie
        duck_native = con.execute(
            f"SELECT round({tie!r}::DOUBLE, 6)"
        ).fetchone()[0]
        spark_native = spark.range(1).select(
            F.round(F.lit(tie), 6).alias("v")
        ).collect()[0]["v"]
        assert spark_native != duck_native, (
            "engines now agree on native round(tie, 6) — if Spark or "
            "DuckDB changed rounding semantics, revisit whether "
            "round_ties_safe is still needed"
        )
        # 2) the shared tie-safe rounding agrees exactly on the tie
        duck_safe = con.execute(
            f"SELECT {round_ties_safe_sql(repr(tie) + '::DOUBLE', 6)}"
        ).fetchone()[0]
        spark_safe = spark.range(1).select(
            round_ties_safe(F.lit(tie), 6).alias("v")
        ).collect()[0]["v"]
        assert spark_safe == duck_safe
        # 3) money-grid tie probe: values whose 7th decimal rendering
        # terminates in 5 (the class the histogram device emits over
        # cent-grid inputs), plus negatives and 9/4-dp conventions
        probes = [
            (i + j / 1e7, d)
            for i in (0, 3, 265367, 999999)
            for j in (5, 15, 25, 4375, 8125)
            for d in (4, 6, 9)
        ] + [(-265367.6184375, 6), (-0.00000315, 6)]
        for v, d in probes:
            ds = con.execute(
                f"SELECT {round_ties_safe_sql(repr(v) + '::DOUBLE', d)}"
            ).fetchone()[0]
            ss = spark.range(1).select(
                round_ties_safe(F.lit(v), d).alias("v")
            ).collect()[0]["v"]
            assert ss == ds, f"tie probe diverged at ({v!r}, {d})"
    finally:
        con.close()


def test_round_ties_safe_randomized_sweep(spark):
    """Property-style cross-engine sweep of the tie-safe device: 400
    seeded random doubles across 13 orders of magnitude plus
    constructed ...5-terminating renderings, rounded at every scale
    the registry uses (2/4/6/9 dp), must agree bit-for-bit. One Spark
    job and one DuckDB query per run; repr() round-trips doubles
    exactly in both engines, so the inputs are identical."""
    import random

    import duckdb

    from deker_server_adapters_spark.functions.histogram import (
        round_ties_safe,
        round_ties_safe_sql,
    )

    rng = random.Random(42)
    vals = [rng.uniform(-1.0, 1.0) * 10.0 ** rng.randint(-6, 6) for _ in range(400)]
    # adversarial: renderings terminating in 5 one digit past each scale
    for s in (2, 4, 6, 9):
        vals += [n * 10.0 ** -(s + 1) / 2.0 for n in range(-19, 20, 2)]
    scales = (2, 4, 6, 9)
    rows = [(float(v),) for v in vals]
    sdf = spark.createDataFrame(rows, "v double").select(
        "v", *[round_ties_safe(F.col("v"), s).alias(f"s{s}") for s in scales]
    )
    got = sdf.collect()
    con = duckdb.connect()
    try:
        # CAST('<repr>' AS DOUBLE): a bare decimal literal parses as
        # DECIMAL first and the DECIMAL->DOUBLE hop can be 1 ulp off;
        # the string->double parse is correct IEEE-nearest
        union = " UNION ALL ".join(
            f"SELECT CAST('{v!r}' AS DOUBLE) AS v" for (v,) in rows
        )
        cols = ", ".join(round_ties_safe_sql("v", s) + f" AS s{s}" for s in scales)
        want = con.execute(f"SELECT v, {cols} FROM ({union})").fetchall()
    finally:
        con.close()
    for (v,), g, w in zip(rows, got, want):
        assert g["v"] == w[0] == v  # rows line up (narrow plans, no shuffle)
        for i, s in enumerate(scales):
            assert g[f"s{s}"] == w[i + 1], (v, s, g[f"s{s}"], w[i + 1])
