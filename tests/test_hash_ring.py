"""Hash-ring tests, modeled on the reference cluster tests: stable
assignment, fallback iteration, weights, minimal movement on node
add/remove, and SQL-vs-Python agreement for the ring-as-a-query path.
"""

from __future__ import annotations

from deker_server_adapters_spark.plans.hash_ring import HashRing, hash_key, primary_attrs_key


NODES = [f"node-{i}" for i in range(5)]


def test_deterministic_and_covering():
    ring = HashRing(NODES)
    keys = [f"array-{i}" for i in range(1000)]
    owners = [ring.get_node(k) for k in keys]
    assert owners == [ring.get_node(k) for k in keys]  # stable
    assert set(owners) == set(NODES)  # every node gets traffic
    counts = {n: owners.count(n) for n in NODES}
    assert min(counts.values()) > 1000 / len(NODES) / 4  # rough balance


def test_iterate_nodes_distinct_and_starts_at_owner():
    ring = HashRing(NODES)
    order = list(ring.iterate_nodes("some-key"))
    assert order[0] == ring.get_node("some-key")
    assert sorted(order) == sorted(NODES)


def test_weights_shift_load():
    heavy = HashRing(NODES, weights={"node-0": 8})
    keys = [f"k{i}" for i in range(2000)]
    owners = [heavy.get_node(k) for k in keys]
    share0 = owners.count("node-0") / len(owners)
    assert share0 > 0.4  # 8 of 12 total weight


def test_minimal_movement_on_node_add():
    before = HashRing(NODES)
    after = HashRing(NODES + ["node-5"])
    keys = [f"k{i}" for i in range(2000)]
    moved = before.moved_keys(after, keys)
    # consistent hashing: ~1/6 of keys move, never the majority
    assert len(moved) < len(keys) * 0.35
    # every moved key landed on some node (and mostly the new one)
    landed_new = [k for k in moved if after.get_node(k) == "node-5"]
    assert len(landed_new) >= len(moved) * 0.9


def test_primary_attrs_key_parity():
    # reference utils/hashing.py: v_position dash-joined, '/'-joined attrs
    assert primary_attrs_key({"vid": "v1", "v_position": [1, 2, 3]}) == "v1/1-2-3"
    assert primary_attrs_key({}) == ""


def test_primary_attrs_key_datetime_utc_normalization():
    """Reference utils/hashing.py:19 applies get_utc() before isoformat():
    naive datetimes are interpreted as UTC (tzinfo attached), aware ones
    converted — so a naive wall time and its +05:00 equivalent hash to the
    *different-instant* vs *same-instant* keys exactly as the reference
    cluster would route them."""
    from datetime import datetime, timedelta, timezone

    naive = datetime(2024, 3, 1, 12, 30, 0)
    assert primary_attrs_key({"ts": naive}) == "2024-03-01T12:30:00+00:00"

    plus5 = datetime(2024, 3, 1, 17, 30, 0, tzinfo=timezone(timedelta(hours=5)))
    # same instant as 12:30 UTC -> identical routing key
    assert primary_attrs_key({"ts": plus5}) == "2024-03-01T12:30:00+00:00"

    utc = datetime(2024, 3, 1, 12, 30, 0, tzinfo=timezone.utc)
    assert primary_attrs_key({"ts": utc}) == primary_attrs_key({"ts": naive})

    # mixed attrs keep ordering and joining semantics
    key = primary_attrs_key({"vid": "v1", "ts": plus5, "v_position": [0, 1]})
    assert key == "v1/2024-03-01T12:30:00+00:00/0-1"

    # routing consequence: all three spellings land on the same node
    ring = HashRing(NODES)
    nodes = {
        ring.get_node(primary_attrs_key({"ts": v})) for v in (naive, plus5, utc)
    }
    assert len(nodes) == 1


def test_sql_ring_matches_python(spark, sf_dir):
    """The ring-as-SQL broadcast join (operators/arrays.py) must agree
    with the driver-side implementation key for key."""
    from deker_server_adapters_spark.operators.arrays import hash_ring_assignment

    ring = HashRing(NODES)
    got = {
        r["c_custkey"]: r["node"]
        for r in hash_ring_assignment(spark, sf_dir).collect()
    }
    for custkey, node in got.items():
        assert node == ring.get_node(str(custkey)), custkey


def test_array_routing_key_prefers_primary_attrs():
    from deker_server_adapters_spark.plans.hash_ring import fallback_nodes, hash_key_for_array

    ring = HashRing(NODES)
    with_primary = {"id": "abc", "primary_attributes": {"vid": "v1", "v_position": [0, 2]}}
    by_id_only = {"id": "abc", "primary_attributes": {}}
    assert hash_key_for_array(with_primary) == "v1/0-2"
    assert hash_key_for_array(by_id_only) == "abc"
    order = fallback_nodes(ring, with_primary)
    assert order[0] == ring.get_node("v1/0-2")
    assert sorted(order) == sorted(NODES)


def test_hash_key_is_le_uint32():
    # spot value computed independently: little-endian first word of md5
    import hashlib

    k = "node-0-0"
    expected = int.from_bytes(hashlib.md5(k.encode()).digest()[:4], "little")
    assert hash_key(k) == expected
