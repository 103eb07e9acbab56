"""Empty-input robustness: every registry op must RUN on 0-row tables
(correct schemas) — not crash — and oracled ops must still agree with
DuckDB there (global aggregates legitimately emit their one NULL/zero
row on empty input; a result-count mismatch on empty tables is the
same oracle-drift bug as on real data). Real pipelines hit this
constantly: an empty date partition, an upstream filter that matched
nothing."""

from __future__ import annotations

import os

import pytest

from deker_server_adapters_spark.operators import all_ops
from tests.oracle_utils import duckdb_con

# slow tier: a 185-op robustness sweep (~9 min) — valuable, but not
# part of the default fast gate (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    from deker_server_adapters_spark.sources.tables import TABLES, load_table

    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        (
            load_table(spark, "/root/testdata/sf0.001", t)
            .limit(0)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"{t}.parquet"))
        )
    return d


@pytest.fixture(scope="module")
def empty_duck(empty_sf_dir):
    # Spark writes each table as a DIRECTORY of part files (the driver's
    # testdata uses single files, which oracle_utils handles); glob into
    # the dirs here.
    import glob

    import duckdb

    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(empty_sf_dir, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", list(all_ops()))
def test_op_survives_empty_tables(spark, empty_sf_dir, empty_duck, name):
    op = all_ops()[name]
    df = op.builder(spark, empty_sf_dir)
    n = df.count()
    assert len(df.columns) > 0  # schema intact even with no rows
    if op.oracle is not None:
        want = len(empty_duck.execute(op.oracle).fetchall())
        assert n == want, f"{name}: spark {n} rows vs oracle {want} on empty input"
