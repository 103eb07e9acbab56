"""Factory wiring tests (mirrors reference test_factory.py): adapters
come from one constructor; cluster logic gated on a cluster config."""

from __future__ import annotations

import numpy as np
import pytest

from deker_server_adapters_spark.core import ArraySchema, DimensionSchema
from deker_server_adapters_spark.factory import AdaptersFactory
from deker_server_adapters_spark.plans.cluster import FileStatus, migration_statuses

SCHEMA = ArraySchema(dtype="float64", dimensions=(DimensionSchema("x", 4),))

CLUSTER = {
    "mode": "cluster",
    "leader_id": "a",
    "raft": [{"host": "h1", "port": "80", "id": "a"}],
    "current": [
        {"host": "h1", "port": "80", "id": "a"},
        {"host": "h2", "port": "80", "id": "b"},
    ],
    "target": [
        {"host": "h1", "port": "80", "id": "a"},
        {"host": "h2", "port": "80", "id": "b"},
        {"host": "h3", "port": "80", "id": "c"},
    ],
}


def test_factory_end_to_end(spark, tmp_path):
    f = AdaptersFactory(spark, f"file://{tmp_path}/wh")
    coll = f.get_collection_adapter().create("c1", SCHEMA)
    arr = f.get_array_adapter("c1").create(data=np.arange(4.0))
    np.testing.assert_allclose(arr.read_data(), [0, 1, 2, 3])
    assert coll.name == "c1"
    f.close()


def test_factory_rejects_unknown_scheme(spark, tmp_path):
    with pytest.raises(ValueError):
        AdaptersFactory(spark, f"http://{tmp_path}")


def test_cluster_gating(spark, tmp_path):
    single = AdaptersFactory(spark, str(tmp_path / "a"))
    with pytest.raises(AttributeError):
        _ = single.hash_ring  # parity: base.py:62-67
    clustered = AdaptersFactory(spark, str(tmp_path / "b"), cluster_config=CLUSTER)
    assert clustered.hash_ring.get_node("k") in {"a", "b"}


def test_cluster_mode_forbids_id_lookup_with_primary_attrs(spark, tmp_path):
    from deker_server_adapters_spark.core import AttributeSchema
    from deker_server_adapters_spark.core.errors import FilteringByIdInClusterIsForbidden

    keyed = ArraySchema(
        dtype="float64",
        dimensions=(DimensionSchema("x", 4),),
        attributes=(AttributeSchema("station", primary=True),),
    )
    f = AdaptersFactory(spark, str(tmp_path / "wh"), cluster_config=CLUSTER)
    f.get_collection_adapter().create("k", keyed)
    arrays = f.get_array_adapter("k")
    arr = arrays.create({"station": "s1"})
    with pytest.raises(FilteringByIdInClusterIsForbidden):
        arrays.get_by_id(arr.id)
    # primary-attribute lookup is the sanctioned path
    assert arrays.get_by_primary_attributes({"station": "s1"}).id == arr.id
    # schemas WITHOUT primary attrs may look up by id even in cluster mode
    f.get_collection_adapter().create("plain", SCHEMA)
    plain = f.get_array_adapter("plain")
    a2 = plain.create()
    assert plain.get_by_id(a2.id).id == a2.id


def test_migration_statuses():
    from deker_server_adapters_spark.plans.cluster import ClusterConfig

    cfg = ClusterConfig.from_dict(CLUSTER)
    keys = [f"k{i}" for i in range(200)]
    moving = list(cfg.rebalance_plan(keys))
    statuses = migration_statuses(cfg, keys, completed=set(moving[:1]))
    assert statuses[moving[0]] == FileStatus.MOVED
    assert all(statuses[k] == FileStatus.UNMOVED for k in moving[1:])
    stay = [k for k in keys if k not in moving]
    assert all(statuses[k] == FileStatus.NORMAL for k in stay)


def test_get_api_version():
    from deker_server_adapters_spark.factory import get_api_version

    assert get_api_version() == "v1"
