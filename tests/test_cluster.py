"""Cluster-config + rate-limit parity tests (modeled on the reference
test_cluster/ + test_rate_limits suites)."""

from __future__ import annotations

import pytest

from deker_server_adapters_spark.plans.cluster import (
    ClusterConfig,
    DekerClusterError,
    DekerRateLimitError,
    Node,
    RateLimiter,
)

CONFIG = {
    "mode": "cluster",
    "leader_id": "a",
    "raft": [
        {"host": "h1", "port": "80", "id": "a"},
        {"host": "h2", "port": "80", "id": "b"},
    ],
    "current": [
        {"host": "h1", "port": "80", "id": "a"},
        {"host": "h2", "port": "80", "id": "b"},
        {"host": "h3", "port": "80", "id": "c"},
    ],
}


def test_from_dict_resolves_leader_and_sorts():
    cfg = ClusterConfig.from_dict(CONFIG)
    assert cfg.leader.id == "a"
    assert [str(n) for n in cfg.current] == ["a", "b", "c"]
    assert cfg.in_cluster_mode
    assert cfg.target is None and cfg.target_ring() is None


def test_missing_leader_raises():
    bad = {**CONFIG, "leader_id": "zz"}
    with pytest.raises(DekerClusterError):
        ClusterConfig.from_dict(bad)


def test_rebalance_plan_minimal_moves():
    cfg = ClusterConfig.from_dict(
        {**CONFIG, "target": CONFIG["current"] + [{"host": "h4", "port": "80", "id": "d"}]}
    )
    keys = [f"k{i}" for i in range(1000)]
    plan = cfg.rebalance_plan(keys)
    assert 0 < len(plan) < 500  # some keys move, never the majority
    assert all(dst == "d" for _, dst in plan.values())  # only to the new node


def test_node_url():
    n = Node(host="h1", port="8000", protocol="https", id="x")
    assert n.url == "https://h1:8000"


def test_rate_limiter_window():
    t = [0.0]
    rl = RateLimiter(limit=3, window_sec=60, clock=lambda: t[0])
    for _ in range(3):
        rl.acquire()
    assert rl.remaining == 0
    with pytest.raises(DekerRateLimitError) as e:
        rl.acquire()
    assert e.value.limit == 3 and e.value.remaining == 0 and e.value.reset == 60
    t[0] = 61.0  # window rolls
    rl.acquire()
    assert rl.remaining == 2
