"""Engine entry point — parity with the reference's AdaptersFactory
(factory.py): one constructor wires every adapter. Here the 'uri' is a
storage root; the factory hands out collection/array/varray adapters
bound to a shared SparkSession the way the reference binds them to a
shared HttpxClient + cluster config.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from deker_server_adapters_spark.core.collection import CollectionAdapter, Warehouse
from deker_server_adapters_spark.plans.cluster import ClusterConfig


def get_api_version() -> str:
    """API version parity (reference utils/version.py:1-3): collection
    metadata written by this engine is compatible with the reference's
    v1 resource layout."""
    return "v1"


class AdaptersFactory:
    """Produces the engine adapters for a storage root.

    ``cluster_config`` is optional: when given, the factory exposes the
    hash ring / rebalance planning exactly as the reference applies the
    server's cluster document (factory.py:54 request_and_apply_config).
    """

    uri_schemes = ("file",)

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cluster_config: dict | None = None,
    ):
        if "://" in root:
            scheme, _, path = root.partition("://")
            if scheme not in self.uri_schemes:
                raise ValueError(f"unsupported scheme {scheme!r}; expected {self.uri_schemes}")
            root = path
        self.warehouse = Warehouse(spark, root)
        self.cluster_config = (
            ClusterConfig.from_dict(cluster_config) if cluster_config else None
        )

    def get_collection_adapter(self) -> CollectionAdapter:
        return self.warehouse.collections

    def get_array_adapter(self, collection_name: str):
        from deker_server_adapters_spark.core.array import ArrayAdapter

        return ArrayAdapter(
            self.warehouse.collections.read(collection_name),
            cluster_mode=self.cluster_config is not None,
        )

    def get_varray_adapter(self, collection_name: str):
        return self.warehouse.collections.read(collection_name).varrays

    @property
    def hash_ring(self):
        if self.cluster_config is None:
            raise AttributeError("Attempt to use cluster logic in single server mode")
        return self.cluster_config.ring()

    def close(self) -> None:
        """Nothing persistent to tear down; SparkSession lifecycle is
        the caller's (parity no-op for the reference's client close)."""
