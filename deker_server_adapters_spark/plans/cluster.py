"""Cluster topology model — parity with the reference's
cluster_config.py: a config names the RAFT leader, the *current*
nodes, and (during rebalancing) a *target* node set; the hash ring is
built from current, a second ring from target, and the difference
between the two is the set of keys that must move.

In the Spark re-expression, "nodes" are partitions-of-responsibility:
the rings drive the ``hash_ring_assignment`` broadcast join, and
``rebalance_plan`` yields the minimal move set (what the reference's
MOVED/UNMOVED file statuses track, models.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Optional

from deker_server_adapters_spark.core.errors import DekerSparkError
from deker_server_adapters_spark.plans.hash_ring import HashRing


class DekerClusterError(DekerSparkError):
    pass


@dataclass(frozen=True)
class Node:
    host: str
    port: str
    protocol: str = "http"
    id: Optional[str] = None

    @property
    def url(self) -> str:
        return f"{self.protocol}://{self.host}:{self.port}"

    def __str__(self) -> str:
        return self.id or ""


@dataclass
class ClusterConfig:
    mode: str
    leader: Node
    current: list[Node]
    target: Optional[list[Node]] = None

    @classmethod
    def from_dict(cls, d: dict) -> "ClusterConfig":
        """Parse the reference's config document shape
        (cluster_config.py:52-78): ``leader_id`` resolved against the
        RAFT node list; current/target sorted by node id."""
        leader_id = d["leader_id"]

        def nodes_of(key: str) -> list[Node]:
            ns = [Node(**nd) for nd in d[key]]
            ns.sort(key=str)
            return ns

        raft = nodes_of("raft")
        leader = next((n for n in raft if n.id == leader_id), None)
        if leader is None:
            raise DekerClusterError("No leader has been found")
        return cls(
            mode=d["mode"],
            leader=leader,
            current=nodes_of("current"),
            target=nodes_of("target") if "target" in d else None,
        )

    @property
    def in_cluster_mode(self) -> bool:
        return self.mode == "cluster"

    def ring(self) -> HashRing:
        return HashRing([str(n) for n in self.current])

    def target_ring(self) -> Optional[HashRing]:
        if not self.target:
            return None
        return HashRing([str(n) for n in self.target])

    def rebalance_plan(self, keys: Iterable[str]) -> dict[str, tuple[str, str]]:
        """{key: (from_node, to_node)} for keys that move under the
        target ring; empty when not rebalancing."""
        tgt = self.target_ring()
        if tgt is None:
            return {}
        cur = self.ring()
        plan = {}
        for k in keys:
            a, b = cur.get_node(k), tgt.get_node(k)
            if a != b:
                plan[k] = (a, b)
        return plan


class FileStatus:
    """Chunk/file migration statuses during rebalancing — parity with
    the reference's Status enum (models.py): NORMAL, MOVED
    ('exported'), UNMOVED ('exporting')."""

    NORMAL = "normal"
    MOVED = "exported"
    UNMOVED = "exporting"


def migration_statuses(
    config: "ClusterConfig", keys: Iterable[str], completed: set[str]
) -> dict[str, str]:
    """Status per key mid-rebalance: keys that must move are
    'exporting' until marked completed ('exported'); keys that stay
    put are 'normal'."""
    plan = config.rebalance_plan(keys)
    out = {}
    for k in keys:
        if k not in plan:
            out[k] = FileStatus.NORMAL
        elif k in completed:
            out[k] = FileStatus.MOVED
        else:
            out[k] = FileStatus.UNMOVED
    return out


class RateLimiter:
    """Token-bucket request limiter exposing the reference's
    RateLimit-Limit / -Remaining / -Reset vocabulary
    (httpx_client.py:19-37). Clock injected for determinism."""

    def __init__(self, limit: int, window_sec: int, clock=None):
        import time

        self.limit = limit
        self.window = window_sec
        self._clock = clock or time.monotonic
        self._window_start = self._clock()
        self._used = 0

    def _roll(self) -> None:
        now = self._clock()
        if now - self._window_start >= self.window:
            self._window_start = now
            self._used = 0

    @property
    def remaining(self) -> int:
        self._roll()
        return max(0, self.limit - self._used)

    @property
    def reset(self) -> int:
        self._roll()
        return max(0, int(self.window - (self._clock() - self._window_start)))

    def acquire(self) -> None:
        from deker_server_adapters_spark.core.errors import DekerDataPointsLimitError

        self._roll()
        if self._used >= self.limit:
            err = DekerRateLimitError("Too many requests, try again later")
            err.limit = self.limit
            err.remaining = 0
            err.reset = self.reset
            raise err
        self._used += 1


class DekerRateLimitError(DekerSparkError):
    """429 parity: carries limit/remaining/reset."""

    limit: int | None = None
    remaining: int | None = None
    reset: int | None = None


# -- retry / healthcheck state machine ---------------------------------------
#
# The reference walks nodes until one answers (utils/requests.py:47-70
# make_request), re-requests the cluster config before every cluster
# request (utils/requests.py:89-126 request_in_cluster ->
# cluster_config.py:148-155 request_and_apply_config), and applies a
# fresh config shipped inside a non-leader-write error then retries
# (tests/test_cases/test_cluster/test_httpx_client.py). Here "nodes"
# are logical responsibility partitions and the transport is injected
# (there is no HTTP in the engine), but the failover order, the error
# vocabulary, and the config-refresh points are the same.


class NodeUnavailable(DekerSparkError):
    """Transport-level failure of one node — the analogue of a request
    exception swallowed per node in reference utils/requests.py:38-44."""


class NonLeaderWrite(DekerSparkError):
    """A write hit a non-leader node; carries the fresh config the
    cluster responds with (reference consts.NON_LEADER_WRITE handling,
    test_httpx_client.py:12-51)."""

    def __init__(self, config: dict):
        super().__init__("write sent to non-leader node")
        self.config = config


def with_fallback(nodes, fn):
    """Call ``fn(node)`` walking ``nodes`` in order (owner first — pass
    ``plans.hash_ring.fallback_nodes`` output); first success wins.
    ``NodeUnavailable`` moves on to the next node; when every node
    fails, raise ``HealthcheckError`` (reference make_request exhausting
    its node list means no response -> DekerServerError/HealthcheckError
    at the caller, cluster_config.py:92-97)."""
    from deker_server_adapters_spark.core.errors import HealthcheckError

    nodes = list(nodes)
    failures: list[str] = []
    for node in nodes:
        try:
            return fn(node)
        except NodeUnavailable as e:
            failures.append(f"{node}: {e}")
    raise HealthcheckError(
        f"all {len(nodes)} nodes failed; tried in fallback order: {failures}"
    )


class ClusterSession:
    """The ``ctx.extra`` analogue: holds the applied ClusterConfig and
    its rings, refreshes the config before cluster requests, and closes
    itself when the healthcheck fails.

    ``transport(node, op, payload)`` is injected; ``op='ping'`` must
    return the config document (reference GET /v1/ping,
    cluster_config.py:80-104). Raise ``NodeUnavailable`` to simulate a
    dead node, ``NonLeaderWrite(new_config)`` to ship a fresh config.
    """

    def __init__(self, seed_nodes: list[str], transport):
        if not seed_nodes:
            raise DekerClusterError("need at least one seed node")
        self.seed_nodes = list(seed_nodes)
        self.transport = transport
        self.config: ClusterConfig | None = None
        self.closed = False

    # -- healthcheck / config ------------------------------------------------

    def request_config(self) -> dict | None:
        """Ping nodes in random order without replacement until one
        answers (reference make_request randint pop loop); all dead ->
        close the session and raise HealthcheckError (reference
        cluster_config.py:92-97 closes the httpx client)."""
        import random

        from deker_server_adapters_spark.core.errors import HealthcheckError

        order = (
            [self.seed_nodes[0]]
            if len(self.seed_nodes) == 1
            else random.sample(self.seed_nodes, len(self.seed_nodes))
        )
        try:
            return with_fallback(order, lambda n: self.transport(n, "ping", None))
        except HealthcheckError:
            self.closed = True
            raise

    def apply_config(self, config_dict: dict) -> None:
        """Parse + install a config document: rings rebuilt, leader set
        (reference cluster_config.py:126-145 apply_config)."""
        self.config = ClusterConfig.from_dict(config_dict)

    def request_and_apply_config(self) -> None:
        """Reference cluster_config.py:148-155: only a cluster-mode
        config is applied; multiple seed nodes answering with a
        non-cluster config is a DekerClusterError
        (is_config_in_cluster_mode, cluster_config.py:107-123)."""
        config = self.request_config()
        in_cluster = config is not None and config.get("mode") == "cluster"
        if not in_cluster and len(self.seed_nodes) > 1:
            raise DekerClusterError(
                "Server responded with wrong config. Key 'mode' either "
                "doesn't exist or its value differs from 'cluster'"
            )
        if in_cluster:
            self.apply_config(config)

    # -- routed requests -----------------------------------------------------

    def request_in_cluster(
        self,
        array_meta: dict,
        op: str,
        payload=None,
        should_check_status: bool = False,
        statuses: dict[str, str] | None = None,
    ):
        """Route a request to the array's owner with the full reference
        state machine (utils/requests.py:89-126):

        1. refresh the config first (request_and_apply_config);
        2. owner = current ring node for the array's hash key; when the
           file's migration status is MOVED, the *target* ring owns it;
        3. a NonLeaderWrite answer applies the shipped config and
           retries once against the new topology;
        4. a dead owner falls back along the ring walk
           (hash_ring.fallback_nodes); all dead -> HealthcheckError.
        """
        from deker_server_adapters_spark.plans.hash_ring import (
            HashRing,
            fallback_nodes,
            hash_key_for_array,
        )

        self.request_and_apply_config()
        if self.config is None:
            # reference treats a single seed answering with a
            # non-cluster config as non-cluster mode
            # (cluster_config.py:107-123): there is no ring to route
            # on, so routed requests are a usage error, not an assert
            raise DekerClusterError(
                "Cluster routing requested but the server is in "
                "non-cluster mode (no cluster config applied)"
            )

        def owner_ring() -> HashRing:
            if should_check_status and statuses is not None:
                key = hash_key_for_array(array_meta)
                if statuses.get(key) == FileStatus.MOVED:
                    tgt = self.config.target_ring()
                    if tgt is not None:
                        return tgt
            return self.config.ring()

        try:
            return with_fallback(
                fallback_nodes(owner_ring(), array_meta),
                lambda n: self.transport(n, op, payload),
            )
        except NonLeaderWrite as e:
            # fresh topology shipped in the error: apply, retry once
            self.apply_config(e.config)
            return with_fallback(
                fallback_nodes(owner_ring(), array_meta),
                lambda n: self.transport(n, op, payload),
            )
