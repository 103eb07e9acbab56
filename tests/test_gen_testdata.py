"""tools/gen_testdata distributional claims (VERDICT r16 item 2): the
generator anchors PERFORMANCE numbers at scales the driver never
ships (sf1, the >262k frontier corpus), so the claims its docstring
makes — schema identity with the driver's parquet, natural key
cardinality growth, the planted exact-dup rate, the cos>=tau pair
rate — need pinning, or every bench row read off a generated corpus
is resting on an unchecked profile. Pure pyarrow/numpy: no Spark
session, runs in seconds."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from deker_server_adapters_spark.tools.gen_testdata import _BASE, generate

DRIVER_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    # scale 0.1 of sf0.1 == the driver's sf0.01 profile: big enough
    # for rate estimates, small enough for a seconds-fast module
    d = str(tmp_path_factory.mktemp("gen_sf001"))
    generate(d, scale=0.1, seed=42)
    return d


def test_schemas_match_driver_parquet(gen_dir):
    """Column names and arrow types equal the driver's own files for
    every table — the 'identical schemas (incl. TIMESTAMP columns)'
    claim; a drift here silently de-anchors every generated bench."""
    for t in list(_BASE) + ["region", "nation"]:
        got = pq.read_schema(os.path.join(gen_dir, f"{t}.parquet"))
        want = pq.read_schema(os.path.join(DRIVER_SF, f"{t}.parquet"))
        assert got.names == want.names, t
        for name in want.names:
            assert got.field(name).type == want.field(name).type, (t, name)


def test_row_counts_and_key_growth(gen_dir, tmp_path):
    """Row counts = sf0.1 counts x scale; dimensions fixed; distinct
    key counts GROW with scale (the natural-cardinality claim that
    separates fresh draws from replication)."""
    for t, c in _BASE.items():
        n = pq.read_metadata(os.path.join(gen_dir, f"{t}.parquet")).num_rows
        assert n == int(c * 0.1), t
    assert pq.read_metadata(os.path.join(gen_dir, "region.parquet")).num_rows == 5
    assert pq.read_metadata(os.path.join(gen_dir, "nation.parquet")).num_rows == 25

    d2 = str(tmp_path / "x2")
    generate(d2, scale=0.2, seed=42, only={"orders", "events", "documents"})

    def distinct(d, t, col):
        return len(set(pq.read_table(os.path.join(d, f"{t}.parquet"), columns=[col])[col].to_pylist()))

    for t, col, lo in (
        ("orders", "o_custkey", 1.6),
        ("events", "user_id", 1.6),
        ("documents", "doc_id", 2.0),
    ):
        r = distinct(d2, t, col) / distinct(gen_dir, t, col)
        assert r >= lo, (t, r)


def test_documents_exact_dup_rate(tmp_path):
    """Planted exact-duplicate fraction ~0.16% (every 625th doc copies
    the one 625 earlier) at a scale where the plant actually lands."""
    d = str(tmp_path / "docs")
    generate(d, scale=1.0, seed=42, only={"documents"})
    texts = pq.read_table(os.path.join(d, "documents.parquet"), columns=["text"])[
        "text"
    ].to_pylist()
    n = len(texts)
    dup = n - len(set(texts))
    plants = len(range(625, n, 625))
    # planted floor: one dup per plant; random 31-word collisions can
    # only add, and at 10..100 words they add ~nothing
    assert plants <= dup <= plants + max(2, n // 2000), (n, dup, plants)


def test_embeddings_unit_norm_and_pair_rate(tmp_path):
    """Embeddings are unit-norm float32[64]; the cos>=0.35 pair rate
    sits in the corpus's ~0.2% band (the claim the dedup-bench anchor
    rests on: candidate and true-pair volumes at generated scale are
    believable only if this marginal holds)."""
    d = str(tmp_path / "emb")
    generate(d, scale=0.5, seed=42, only={"embeddings"})  # 1000 vectors
    tbl = pq.read_table(os.path.join(d, "embeddings.parquet"))
    X = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    assert X.shape == (1000, 64)
    np.testing.assert_allclose(np.linalg.norm(X, axis=1), 1.0, atol=1e-5)
    cos = X @ X.T
    iu = np.triu_indices(len(X), k=1)
    rate = float((cos[iu] >= 0.35).mean())
    assert 0.0005 <= rate <= 0.006, rate  # ~0.2% +- sampling width


def test_subset_run_matches_full_run(tmp_path):
    """only={'embeddings'} emits byte-identical rows to the full run's
    embeddings table (the per-table substream contract the r17
    frontier corpus depends on)."""
    full, sub = str(tmp_path / "full"), str(tmp_path / "sub")
    generate(full, scale=0.05, seed=7)
    generate(sub, scale=0.05, seed=7, only={"embeddings"})
    a = pq.read_table(os.path.join(full, "embeddings.parquet"))
    b = pq.read_table(os.path.join(sub, "embeddings.parquet"))
    assert a.equals(b)
    assert sorted(os.listdir(sub)) == ["embeddings.parquet"]
