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
