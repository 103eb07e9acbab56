"""Ketama-style consistent hash ring.

Semantics mirror the reference (hash_ring.py): md5-based vnode keys
(floor(40·N·w/Σw) positions per node, 3 little-endian uint32 words per
md5 digest), lookup = first vnode key strictly greater than the key's
hash, wrapping to the smallest. Keys are array ids or '/'-joined
primary attributes (utils/hashing.py), with v_position dash-joined.

Clean-room implementation; the algorithm is the public ketama /
python-hash_ring design.

In Spark the ring is *also* available as a pure-SQL assignment (see
``ring_assignment_df`` and operators/arrays.py): the vnode table is a
few-hundred-row broadcast, so routing a 100 TB table to nodes is one
map-side join — no shuffle of the data side.
"""

from __future__ import annotations

import hashlib
from bisect import bisect_right
from datetime import datetime, timezone
from typing import Iterable, Iterator, Sequence

from deker_server_adapters_spark.core.errors import HashRingError

VNODE_FACTOR = 40  # parity: hash_ring.py:38
WORDS_PER_VNODE = 3


def _get_utc(value: datetime) -> datetime:
    """UTC-normalize a datetime the way the reference does before
    hashing (utils/hashing.py:19 via deker_tools.time.get_utc): naive
    values are *interpreted as UTC* (tzinfo attached, wall clock kept),
    aware values are converted to UTC."""
    if value.tzinfo is None or value.tzinfo.utcoffset(value) is None:
        return value.replace(tzinfo=timezone.utc)
    return value.astimezone(timezone.utc)


def _le32(digest: bytes, word: int) -> int:
    return int.from_bytes(digest[4 * word : 4 * word + 4], "little")


def hash_key(key: str) -> int:
    """Position of a string key on the ring (first LE uint32 word)."""
    return _le32(hashlib.md5(key.encode()).digest(), 0)


def primary_attrs_key(primary_attributes: dict) -> str:
    """'/'-joined primary attributes; v_position dash-joined, datetimes
    ISO (reference utils/hashing.py:8-21)."""
    parts = []
    for name, value in primary_attributes.items():
        if name == "v_position":
            parts.append("-".join(str(v) for v in value))
        elif isinstance(value, datetime):
            parts.append(_get_utc(value).isoformat())
        else:
            parts.append(str(value))
    return "/".join(parts)


def hash_key_for_array(array_meta: dict) -> str:
    """Routing key of an array: '/'-joined primary attributes when the
    schema has them, else the id (reference utils/hashing.py:39-49 —
    this is also why id lookups are forbidden in cluster mode when
    primary attributes exist: the two hashes differ)."""
    primary = array_meta.get("primary_attributes")
    if primary:
        return primary_attrs_key(primary)
    return array_meta["id"]


def fallback_nodes(ring: "HashRing", array_meta: dict) -> list[str]:
    """Node order for serving an array's request: owner first, then the
    ring walked for failover (reference utils/requests.py
    request_in_cluster + make_request retry-over-nodes)."""
    return list(ring.iterate_nodes(hash_key_for_array(array_meta)))


class HashRing:
    def __init__(self, nodes: Sequence[str], weights: dict[str, int] | None = None):
        if not nodes:
            raise HashRingError("ring needs at least one node")
        self.nodes = list(nodes)
        self.weights = dict(weights or {})
        self._keys: list[int] = []
        self._ring: dict[int, str] = {}
        total = sum(self.weights.get(n, 1) for n in self.nodes)
        for node in self.nodes:
            w = self.weights.get(node, 1)
            factor = (VNODE_FACTOR * len(self.nodes) * w) // total
            for j in range(factor):
                digest = hashlib.md5(f"{node}-{j}".encode()).digest()
                for word in range(WORDS_PER_VNODE):
                    k = _le32(digest, word)
                    self._ring[k] = node
                    self._keys.append(k)
        self._keys.sort()

    def get_node(self, key: str) -> str:
        pos = self._position(key)
        return self._ring[self._keys[pos]]

    def _position(self, key: str) -> int:
        if not self._keys:
            raise HashRingError("empty ring")
        pos = bisect_right(self._keys, hash_key(key))
        return 0 if pos == len(self._keys) else pos

    def iterate_nodes(self, key: str) -> Iterator[str]:
        """Fallback order: distinct nodes walking the ring from the
        key's position (reference hash_ring.py:99-133)."""
        pos = self._position(key)
        seen: set[str] = set()
        for k in self._keys[pos:] + self._keys[:pos]:
            node = self._ring[k]
            if node not in seen:
                seen.add(node)
                yield node

    def moved_keys(self, target: "HashRing", keys: Iterable[str]) -> list[str]:
        """Keys whose owner changes under the target ring — the
        rebalancing set (reference cluster_config target ring)."""
        return [k for k in keys if self.get_node(k) != target.get_node(k)]
