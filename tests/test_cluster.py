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


# -- retry / healthcheck state machine (reference utils/requests.py +
# cluster_config.py request/apply + test_cluster/test_httpx_client.py) --


class FakeTransport:
    """Scriptable transport: per-node behaviors, call log."""

    def __init__(self, config, down=(), non_leader_once=None):
        self.config = config
        self.down = set(down)
        self.non_leader_once = non_leader_once  # (node, new_config)
        self.calls = []

    def __call__(self, node, op, payload):
        from deker_server_adapters_spark.plans.cluster import (
            NodeUnavailable,
            NonLeaderWrite,
        )

        self.calls.append((node, op))
        if node in self.down:
            raise NodeUnavailable(f"{node} is down")
        if op == "ping":
            return self.config
        if self.non_leader_once and self.non_leader_once[0] == node:
            _, new_config = self.non_leader_once
            self.non_leader_once = None
            raise NonLeaderWrite(new_config)
        return f"ok:{node}:{op}"


def _session(config=None, **kw):
    from deker_server_adapters_spark.plans.cluster import ClusterSession

    config = config or CONFIG
    transport = FakeTransport(config, **kw)
    nodes = [str(Node(**d)) for d in config["current"]]
    return ClusterSession(nodes, transport), transport


def test_with_fallback_walks_to_first_alive():
    from deker_server_adapters_spark.plans.cluster import NodeUnavailable, with_fallback

    def fn(node):
        if node in ("a", "b"):
            raise NodeUnavailable(node)
        return f"served:{node}"

    assert with_fallback(["a", "b", "c"], fn) == "served:c"


def test_with_fallback_all_dead_is_healthcheck_error():
    from deker_server_adapters_spark.core.errors import HealthcheckError
    from deker_server_adapters_spark.plans.cluster import NodeUnavailable, with_fallback

    def fn(node):
        raise NodeUnavailable(node)

    with pytest.raises(HealthcheckError):
        with_fallback(["a", "b"], fn)


def test_healthcheck_failure_closes_session():
    # reference cluster_config.py:92-97: failed ping closes the client
    from deker_server_adapters_spark.core.errors import HealthcheckError

    sess, _ = _session(down={"a", "b", "c"})
    with pytest.raises(HealthcheckError):
        sess.request_config()
    assert sess.closed


def test_ping_applies_cluster_config():
    sess, _ = _session()
    sess.request_and_apply_config()
    assert sess.config is not None and sess.config.leader.id == "a"
    assert [str(n) for n in sess.config.current] == ["a", "b", "c"]


def test_non_cluster_config_with_multiple_seeds_raises():
    # reference is_config_in_cluster_mode (cluster_config.py:107-123)
    sess, _ = _session({**CONFIG, "mode": "single"})
    with pytest.raises(DekerClusterError):
        sess.request_and_apply_config()


def test_request_in_cluster_routes_to_ring_owner():
    from deker_server_adapters_spark.plans.hash_ring import HashRing, hash_key_for_array

    sess, transport = _session()
    meta = {"id": "arr-1", "primary_attributes": {"station": "s1"}}
    got = sess.request_in_cluster(meta, "read_meta")
    ring = HashRing(["a", "b", "c"])
    owner = ring.get_node(hash_key_for_array(meta))
    assert got == f"ok:{owner}:read_meta"


def test_request_in_cluster_falls_back_past_dead_owner():
    from deker_server_adapters_spark.plans.hash_ring import HashRing, hash_key_for_array

    meta = {"id": "arr-2", "primary_attributes": {"station": "s2"}}
    ring = HashRing(["a", "b", "c"])
    order = list(ring.iterate_nodes(hash_key_for_array(meta)))
    sess, transport = _session(down={order[0]})
    got = sess.request_in_cluster(meta, "read_data")
    assert got == f"ok:{order[1]}:read_data"
    # ping for config refresh came first, then the failed owner attempt
    ops = [op for _, op in transport.calls]
    assert ops[0] == "ping" and ops.count("read_data") == 2


def test_new_config_applied_after_non_leader_error():
    # mirror of reference test_httpx_client.py:12-51: the fresh config
    # shipped in the non-leader error is applied and the write retried
    from deker_server_adapters_spark.plans.hash_ring import HashRing, hash_key_for_array

    meta = {"id": "arr-3", "primary_attributes": {"station": "s3"}}
    ring = HashRing(["a", "b", "c"])
    owner = ring.get_node(hash_key_for_array(meta))
    new_node = {"host": "newhost", "port": "80", "id": "z"}
    new_config = {"mode": "cluster", "leader_id": "z", "raft": [new_node], "current": [new_node]}
    sess, transport = _session(non_leader_once=(owner, new_config))
    got = sess.request_in_cluster(meta, "update_meta")
    assert got == "ok:z:update_meta"  # retried on the new topology
    assert sess.config.leader.id == "z"


def test_moved_file_is_served_by_target_ring():
    # reference request_in_cluster should_check_status branch
    # (utils/requests.py:117-121): MOVED files live on the target ring
    from deker_server_adapters_spark.plans.cluster import FileStatus
    from deker_server_adapters_spark.plans.hash_ring import HashRing, hash_key_for_array

    target = CONFIG["current"] + [{"host": "h4", "port": "80", "id": "d"}]
    cfg = {**CONFIG, "target": target}
    cur_ring = HashRing(["a", "b", "c"])
    tgt_ring = HashRing(["a", "b", "c", "d"])
    # find a key whose owner changes under the target ring
    meta = None
    for i in range(200):
        m = {"id": f"mv{i}", "primary_attributes": {}}
        if cur_ring.get_node(f"mv{i}") != tgt_ring.get_node(f"mv{i}"):
            meta = m
            break
    assert meta is not None
    key = hash_key_for_array(meta)
    sess, _ = _session(cfg)
    moved = sess.request_in_cluster(
        meta, "read_data", should_check_status=True, statuses={key: FileStatus.MOVED}
    )
    assert moved == f"ok:{tgt_ring.get_node(key)}:read_data"
    normal = sess.request_in_cluster(
        meta, "read_data", should_check_status=True, statuses={key: FileStatus.NORMAL}
    )
    assert normal == f"ok:{cur_ring.get_node(key)}:read_data"


def test_single_seed_non_cluster_ping_is_non_cluster_mode():
    # reference cluster_config.py:107-123: ONE seed answering with a
    # non-cluster config is legitimate single-node mode — ping applies
    # nothing and raises nothing...
    from deker_server_adapters_spark.plans.cluster import ClusterSession

    config = {**CONFIG, "mode": "single"}
    transport = FakeTransport(config)
    sess = ClusterSession(["a"], transport)
    sess.request_and_apply_config()
    assert sess.config is None and not sess.closed


def test_routed_request_in_non_cluster_mode_raises():
    # ...but ROUTED requests need a ring; in non-cluster mode that is a
    # DekerClusterError, not an assert
    from deker_server_adapters_spark.plans.cluster import ClusterSession

    config = {**CONFIG, "mode": "single"}
    transport = FakeTransport(config)
    sess = ClusterSession(["a"], transport)
    meta = {"id": "arr-1", "primary_attributes": {}}
    with pytest.raises(DekerClusterError):
        sess.request_in_cluster(meta, "read_meta")
