from deker_server_adapters_spark.plans.hash_ring import HashRing

__all__ = ["HashRing"]
