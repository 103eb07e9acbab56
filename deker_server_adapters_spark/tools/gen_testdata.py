"""Synthetic testdata generator at arbitrary scale — the "one real
sf1 point" anchor (VERDICT r15 item 7).

The stress/frontier harnesses scale by REPLICATING the sf0.1 tables
with shifted keys, which preserves per-key row counts but repeats
every value verbatim (each document/vector gets K exact clones — an
upper bound for dedup candidate volume, an unnatural shape for value
distributions). This generator instead draws FRESH rows at the target
scale with the sf0.1 profile measured off the driver's own files:

- identical schemas (incl. TIMESTAMP columns) and key contiguity,
- row counts = sf0.1 counts x (sf / 0.1), dimension tables fixed,
- value marginals matched to the measured sf0.1 ranges/frequencies
  (order dates 1995..2001-08 at day grain, ship dates independent,
  l_quantity 1..50 integers, 11 discount / 9 tax levels, events over
  30 days with ~exponential(50) values, the 31-word document vocab at
  10..100 words, ~0.16% planted exact-dup docs, unit-norm gaussian
  64-d embeddings whose cos>=0.35 pair rate reproduces the corpus's
  ~0.2% naturally),
- NATURAL cardinality growth: 10x orders means 10x distinct order
  keys, 10x users, 10x distinct documents — the regime a real sf1
  has and replication does not.

It is NOT the driver's generator (different seed/derivations), so it
anchors PERFORMANCE only — correctness stays on the driver's parquet.

Usage:
    python -m deker_server_adapters_spark.tools.gen_testdata OUT_DIR [SCALE] [ONLY]

SCALE is relative to sf0.1 (default 10 = sf1). ONLY is an optional
comma-separated table subset (e.g. ``embeddings`` for the r17 >262k
sharded-dedup frontier corpus — 500k vectors need scale 250, and
generating 150M lineitem rows alongside would be pure waste). Each
table draws from its own seeded substream, so a subset run emits
byte-identical tables to a full run at the same seed/scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_BASE = {  # sf0.1 row counts (measured)
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}
_EVENT_USERS = 1_500  # at sf0.1

_SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
_ADJ = ["large", "hot", "blue", "old", "small", "new", "red", "dim"]
_NOUN = ["ring", "bolt", "plate", "case", "drum", "cog", "pin", "disk"]
_ETYPES = ["signup", "click", "error", "view", "purchase"]
_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
_LANGS = ["en", "fr", "es", "de", "zh"]
_LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

_DAY_US = 86_400_000_000


def _ts_days(rng, n, start: str, end: str) -> np.ndarray:
    """Uniform day-grain timestamps as datetime64[us]."""
    lo = np.datetime64(start, "D").astype("datetime64[us]").astype(np.int64)
    days = (np.datetime64(end, "D") - np.datetime64(start, "D")).astype(int)
    return (lo + rng.integers(0, days + 1, n) * _DAY_US).astype("datetime64[us]")


# Per-table rng substream ids: each table draws from its OWN
# default_rng((seed, id)), so generation is table-independent — an
# ``only={'embeddings'}`` subset run (the r17 >262k frontier corpus
# needs 500k vectors and nothing else) produces byte-identical tables
# to the same tables of a full run at the same seed/scale.
_TSEED = {
    "customer": 1,
    "supplier": 2,
    "part": 3,
    "orders": 4,
    "lineitem": 5,
    "events": 6,
    "documents": 7,
    "embeddings": 8,
}


def generate(
    out_dir: str,
    scale: float = 10.0,
    seed: int = 42,
    only: "set[str] | None" = None,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    n = {t: int(c * scale) for t, c in _BASE.items()}
    sizes = {}

    def rng_for(name: str) -> np.random.Generator:
        return np.random.default_rng((seed, _TSEED[name]))

    def want(name: str) -> bool:
        return only is None or name in only

    def write(name: str, table: pa.Table) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        # bounded row groups: a parquet row group is Spark's atomic
        # split unit, and pyarrow's default (1M rows) would hand a
        # 500k-vector frontier corpus to the scan as ONE partition
        pq.write_table(table, path, row_group_size=32768)
        sizes[name] = table.num_rows

    # dimension tables: fixed content, matching the driver's
    if want("region"):
        write(
            "region",
            pa.table(
                {
                    "r_regionkey": pa.array(range(5), pa.int32()),
                    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                }
            ),
        )
    if want("nation"):
        write(
            "nation",
            pa.table(
                {
                    "n_nationkey": pa.array(range(25), pa.int32()),
                    "n_name": [f"NATION_{i}" for i in range(25)],
                    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
                }
            ),
        )

    nc = n["customer"]
    if want("customer"):
        rng = rng_for("customer")
        write(
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array(np.arange(nc), pa.int64()),
                    "c_name": [f"Customer#{i:09d}" for i in range(nc)],
                    "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
                    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
                    "c_mktsegment": np.array(_SEGMENTS)[rng.integers(0, 5, nc)],
                }
            ),
        )
    ns = n["supplier"]
    if want("supplier"):
        rng = rng_for("supplier")
        write(
            "supplier",
            pa.table(
                {
                    "s_suppkey": pa.array(np.arange(ns), pa.int64()),
                    "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
                    "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
                    "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, ns), 2),
                }
            ),
        )
    npart = n["part"]
    if want("part"):
        rng = rng_for("part")
        names = np.array([f"{a} {b}" for a in _ADJ for b in _NOUN])
        write(
            "part",
            pa.table(
                {
                    "p_partkey": pa.array(np.arange(npart), pa.int64()),
                    "p_name": names[rng.integers(0, len(names), npart)],
                    "p_brand": np.array([f"Brand#{i}" for i in range(25)])[
                        rng.integers(0, 25, npart)
                    ],
                    "p_type": np.array(_PTYPES)[rng.integers(0, 6, npart)],
                    "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
                    "p_retailprice": 900.0 + (np.arange(npart) % 1000) / 10.0,
                }
            ),
        )

    no = n["orders"]
    if want("orders"):
        rng = rng_for("orders")
        write(
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array(np.arange(no), pa.int64()),
                    "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
                    "o_orderstatus": np.array(["O", "P", "F"])[
                        rng.integers(0, 3, no)
                    ],
                    "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, no), 2),
                    "o_orderdate": _ts_days(rng, no, "1995-01-01", "2001-08-01"),
                    "o_orderpriority": np.array(_PRIORITIES)[
                        rng.integers(0, 5, no)
                    ],
                }
            ),
        )

    if want("lineitem"):
        # lineitem: per-order fanout 1 + Poisson(3.075) clipped to <= 17
        # (measured mean 4.075, max 17), then truncated to the target
        # count. Needs only the orders COUNT (no), never orders' drawn
        # values, so the per-table substream keeps it independent.
        rng = rng_for("lineitem")
        fan = np.clip(1 + rng.poisson(3.075, no), 1, 17)
        okeys = np.repeat(np.arange(no), fan)[: n["lineitem"]]
        nl = len(okeys)
        lnum = np.concatenate([np.arange(1, f + 1) for f in fan])[:nl]
        write(
            "lineitem",
            pa.table(
                {
                    "l_orderkey": pa.array(okeys, pa.int64()),
                    "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
                    "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
                    "l_linenumber": pa.array(lnum, pa.int32()),
                    "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
                    "l_extendedprice": np.round(
                        rng.uniform(900.0, 105000.0, nl), 2
                    ),
                    "l_discount": rng.integers(0, 11, nl) / 100.0,
                    "l_tax": rng.integers(0, 9, nl) / 100.0,
                    "l_returnflag": np.array(["A", "N", "R"])[
                        rng.integers(0, 3, nl)
                    ],
                    "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, nl)],
                    "l_shipdate": _ts_days(rng, nl, "1995-01-02", "2001-11-04"),
                }
            ),
        )

    if want("events"):
        rng = rng_for("events")
        ne = n["events"]
        users = max(1, int(_EVENT_USERS * scale))
        t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
        span = 30 * _DAY_US
        ts = np.sort(t0 + rng.integers(0, span, ne))
        write(
            "events",
            pa.table(
                {
                    "event_id": pa.array(np.arange(ne), pa.int64()),
                    "ts": ts.astype("datetime64[us]"),
                    "user_id": pa.array(rng.integers(0, users, ne), pa.int64()),
                    "event_type": np.array(_ETYPES)[rng.integers(0, 5, ne)],
                    "value": np.round(rng.exponential(50.0, ne), 2),
                    "props": [
                        f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, ne)
                    ],
                }
            ),
        )

    if want("documents"):
        rng = rng_for("documents")
        nd = n["documents"]
        vocab = np.array(_VOCAB)
        lens = rng.integers(10, 101, nd)
        words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
        texts: list = []
        off = 0
        for ln in lens:
            texts.append(" ".join(words[off : off + ln]))
            off += ln
        for i in range(625, nd, 625):  # ~0.16% planted exact dups
            texts[i] = texts[i - 625]
        langs = np.array(_LANGS)[rng.choice(5, nd, p=_LANG_P)]
        write(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(np.arange(nd), pa.int64()),
                    "text": texts,
                    "lang": langs,
                    "source": np.array([f"src{i}" for i in range(20)])[
                        rng.integers(0, 20, nd)
                    ],
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
        )

    if want("embeddings"):
        rng = rng_for("embeddings")
        nv = n["embeddings"]
        X = rng.standard_normal((nv, 64))
        X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
        write(
            "embeddings",
            pa.table(
                {
                    "vec_id": pa.array(np.arange(nv), pa.int64()),
                    "embedding": pa.array(list(X), pa.list_(pa.float32())),
                    "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
                }
            ),
        )
    return sizes


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    t0 = time.perf_counter()
    sizes = generate(out, scale, only=only)
    sys.stdout.write(
        json.dumps({"out": out, "scale_vs_sf0.1": scale, "rows": sizes,
                    "gen_sec": round(time.perf_counter() - t0, 1)}) + "\n"
    )


if __name__ == "__main__":
    main()
