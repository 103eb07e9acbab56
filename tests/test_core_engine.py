"""Array-engine tests, modeled on the reference's test suite
(tests/test_cases/test_common/test_{array,collection,varray}_adapter.py):
collection CRUD, array CRUD + attribute updates, slice read/write
round-trips vs numpy ground truth, varray spanning + vid deletes.
"""

from __future__ import annotations

import numpy as np
import pytest

from deker_server_adapters_spark.core import (
    Array,
    ArraySchema,
    AttributeSchema,
    DimensionSchema,
    VArraySchema,
    Warehouse,
)
from deker_server_adapters_spark.core.errors import (
    DekerCollectionAlreadyExistsError,
    DekerCollectionNotExistsError,
    DekerDataPointsLimitError,
    DekerSubsetError,
    DekerValidationError,
)


@pytest.fixture()
def warehouse(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


SCHEMA = ArraySchema(
    dtype="float64",
    dimensions=(DimensionSchema("x", 20), DimensionSchema("y", 12)),
    attributes=(
        AttributeSchema("station", "string", primary=True),
        AttributeSchema("comment", "string", primary=False),
    ),
)

VSCHEMA = VArraySchema(
    dtype="float64",
    dimensions=(DimensionSchema("x", 12), DimensionSchema("y", 8)),
    vgrid=(3, 2),
)


class TestCollections:
    def test_create_read_delete(self, warehouse):
        coll = warehouse.collections.create("weather", SCHEMA)
        again = warehouse.collections.read("weather")
        assert again.schema == SCHEMA
        with pytest.raises(DekerCollectionAlreadyExistsError):
            warehouse.collections.create("weather", SCHEMA)
        warehouse.collections.delete(coll)
        with pytest.raises(DekerCollectionNotExistsError):
            warehouse.collections.read("weather")

    def test_iterate_and_clear(self, warehouse):
        warehouse.collections.create("a", SCHEMA)
        c2 = warehouse.collections.create("b", SCHEMA)
        assert [c["name"] for c in warehouse.collections] == ["a", "b"]
        c2.arrays.create({"station": "s1"})
        assert len(list(c2.arrays)) == 1
        warehouse.collections.clear(c2)
        assert len(list(c2.arrays)) == 0
        assert warehouse.collections.read("b").schema == SCHEMA


class TestArrays:
    def test_create_fill_and_read(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        arr = coll.arrays.create({"station": "s1"})
        data = arr.read_data()
        assert data.shape == (20, 12)
        assert (data == 0.0).all()

    def test_roundtrip_and_slices(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        rng = np.random.RandomState(42)
        ref = rng.rand(20, 12)
        arr = coll.arrays.create({"station": "s1"}, data=ref)
        np.testing.assert_allclose(arr.read_data(), ref)
        np.testing.assert_allclose(arr[3:9, 2:5], ref[3:9, 2:5])
        np.testing.assert_allclose(arr[7], ref[7])
        np.testing.assert_allclose(arr[7, 3], ref[7, 3])
        np.testing.assert_allclose(arr[:, 4], ref[:, 4])

    def test_update_and_clear_subsets(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        rng = np.random.RandomState(1)
        ref = rng.rand(20, 12)
        arr = coll.arrays.create({"station": "s1"}, data=ref)
        patch = np.full((4, 3), 7.5)
        arr.update((slice(2, 6), slice(1, 4)), patch)
        ref[2:6, 1:4] = 7.5
        np.testing.assert_allclose(arr.read_data(), ref)
        arr.clear((slice(0, 5), slice(0, 2)))
        ref[0:5, 0:2] = SCHEMA.fill_value
        np.testing.assert_allclose(arr.read_data(), ref)

    def test_meta_and_lookup(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        arr = coll.arrays.create({"station": "s9"}, {"comment": "hi"})
        meta = coll.arrays.read_meta(arr)
        assert meta["primary_attributes"] == {"station": "s9"}
        coll.arrays.update_meta_custom_attributes(arr, {"comment": "bye"})
        assert coll.arrays.read_meta(arr)["custom_attributes"]["comment"] == "bye"
        found = coll.arrays.get_by_primary_attributes({"station": "s9"})
        assert found is not None and found.id == arr.id
        assert coll.arrays.get_by_id(arr.id).id == arr.id
        assert coll.arrays.get_by_id("nope") is None
        coll.arrays.delete(arr)
        assert coll.arrays.get_by_id(arr.id) is None
        assert coll.arrays.is_deleted(arr)

    def test_validation(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        with pytest.raises(DekerValidationError):
            coll.arrays.create({})  # missing primary
        with pytest.raises(DekerValidationError):
            coll.arrays.create({"station": "s", "bogus": 1})
        arr = coll.arrays.create({"station": "s"})
        with pytest.raises(DekerSubsetError):
            arr.read_data((slice(None), slice(None), slice(None)))
        with pytest.raises(DekerSubsetError):
            arr.read_data(99)

    def test_data_points_limit(self, warehouse, monkeypatch):
        import deker_server_adapters_spark.core.storage as storage

        coll = warehouse.collections.create("c", SCHEMA)
        arr = coll.arrays.create({"station": "s"})
        monkeypatch.setattr(storage, "DEFAULT_MAX_POINTS", 10)
        with pytest.raises(DekerDataPointsLimitError) as e:
            coll.arrays.store.read_slice(
                arr.id, coll.arrays._grid(),
                [(0, 20, False), (0, 12, False)], np.dtype("float64"),
                max_points=10,
            )
        assert e.value.limit == 10 and e.value.requested == 240

    def test_meta_df_empty_collection_yields_empty_df(self, warehouse):
        """A created-but-empty collection is a legitimate catalog state:
        meta_df() returns an empty DataFrame, not an exception (the
        exception is reserved for a missing collection) — ADVICE r5."""
        coll = warehouse.collections.create("empty_cat", SCHEMA)
        df = coll.arrays.meta_df()
        assert df.count() == 0
        assert "id" in df.columns

    def test_meta_df_and_ensemble_cells(self, warehouse):
        coll = warehouse.collections.create("ens", SCHEMA)
        rng = np.random.RandomState(23)
        refs = {}
        for i in range(3):
            r = rng.rand(20, 12)
            coll.arrays.create({"station": f"s{i}"}, id_=f"m{i}", data=r)
            refs[f"m{i}"] = r
        # catalog as a DataFrame
        meta = coll.arrays.meta_df()
        assert meta.count() == 3
        assert set(meta.select("primary_attributes.station").toPandas().iloc[:, 0]) == {
            "s0",
            "s1",
            "s2",
        }
        # ensemble mean across arrays per cell
        cells = coll.arrays.cells_df(["m0", "m1", "m2"])
        got = (
            cells.groupBy("x", "y")
            .avg("value")
            .toPandas()
            .sort_values(["x", "y"])["avg(value)"]
            .to_numpy()
            .reshape(20, 12)
        )
        want = np.mean([refs["m0"], refs["m1"], refs["m2"]], axis=0)
        np.testing.assert_allclose(got, want)

    def test_custom_fill_value(self, warehouse):
        from deker_server_adapters_spark.core import ArraySchema, DimensionSchema

        schema = ArraySchema(
            dtype="float64",
            dimensions=(DimensionSchema("x", 6), DimensionSchema("y", 4)),
            fill_value=-9999.0,
        )
        coll = warehouse.collections.create("fv", schema)
        arr = coll.arrays.create()
        assert (arr.read_data() == -9999.0).all()  # born at fill
        arr.update((slice(0, 2), slice(0, 2)), 1.0)
        arr.clear((slice(0, 1), slice(0, 1)))  # clear -> back to fill
        out = arr.read_data()
        assert out[0, 0] == -9999.0 and out[1, 1] == 1.0

    def test_step_slices(self, warehouse):
        coll = warehouse.collections.create("steps", SCHEMA)
        rng = np.random.RandomState(29)
        ref = rng.rand(20, 12)
        arr = coll.arrays.create({"station": "s"}, data=ref)
        np.testing.assert_allclose(arr[::2], ref[::2])
        np.testing.assert_allclose(arr[1:15:3, 2:10:2], ref[1:15:3, 2:10:2])
        np.testing.assert_allclose(arr[::4, 5], ref[::4, 5])

    def test_empty_slice_read(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        arr = coll.arrays.create({"station": "s"}, data=np.ones((20, 12)))
        out = arr.read_data((slice(5, 5), slice(0, 3)))
        assert out.shape == (0, 3)

    def test_cell_df(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        rng = np.random.RandomState(3)
        ref = rng.rand(20, 12)
        arr = coll.arrays.create({"station": "s"}, data=ref)
        pdf = arr.cell_df().toPandas()
        assert len(pdf) == 20 * 12
        got = np.zeros((20, 12))
        got[pdf["x"].to_numpy(), pdf["y"].to_numpy()] = pdf["value"].to_numpy()
        np.testing.assert_allclose(got, ref)


class TestIsolation:
    def test_arrays_in_one_collection_are_isolated(self, warehouse):
        coll = warehouse.collections.create("c", SCHEMA)
        rng = np.random.RandomState(5)
        a_ref, b_ref = rng.rand(20, 12), rng.rand(20, 12)
        a = coll.arrays.create({"station": "a"}, data=a_ref)
        b = coll.arrays.create({"station": "b"}, data=b_ref)
        a.update((slice(0, 3), slice(0, 3)), 99.0)
        a_ref[0:3, 0:3] = 99.0
        np.testing.assert_allclose(a.read_data(), a_ref)
        np.testing.assert_allclose(b.read_data(), b_ref)  # untouched
        coll.arrays.delete(a)
        np.testing.assert_allclose(b.read_data(), b_ref)  # survives sibling delete

    def test_slice_scan_prunes_to_array_partition(self, warehouse):
        from deker_server_adapters_spark.plans.explain import formatted_plan

        coll = warehouse.collections.create("c", SCHEMA)
        arr = coll.arrays.create({"station": "a"})
        coll.arrays.create({"station": "b"})
        scan = coll.arrays.store.scan(arr.id, [0])
        plan = formatted_plan(scan)
        assert "PartitionFilters" in plan and "array_id" in plan


class TestVArrays:
    def test_roundtrip_spanning_chunks(self, warehouse):
        coll = warehouse.collections.create("v", VSCHEMA)
        rng = np.random.RandomState(7)
        ref = rng.rand(12, 8)
        va = coll.varrays.create(data=ref)
        np.testing.assert_allclose(va.read_data(), ref)
        # subset spanning multiple vgrid cells
        np.testing.assert_allclose(va[2:11, 1:7], ref[2:11, 1:7])
        va.update((slice(3, 10), slice(2, 6)), np.full((7, 4), -1.0))
        ref[3:10, 2:6] = -1.0
        np.testing.assert_allclose(va.read_data(), ref)

    def test_chunk_arrays_and_vid_delete(self, warehouse):
        coll = warehouse.collections.create("v", VSCHEMA)
        va = coll.varrays.create()
        chunks = va.chunk_arrays()
        assert len(chunks) == 6  # vgrid 3x2
        positions = sorted(tuple(c.primary_attributes["v_position"]) for c in chunks)
        assert positions == [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1)]
        found = coll.arrays.get_by_primary_attributes({"vid": va.id, "v_position": [1, 1]})
        assert found is not None
        coll.arrays.delete_all_by_vid(va.id)
        assert va.chunk_arrays() == []

    def test_chunk_views_read_and_write_real_data(self, warehouse):
        """Chunk-array views are live windows onto the varray's cells
        (reference chunk arrays hold the data; parity requires the
        views to be readable AND writable)."""
        coll = warehouse.collections.create("v", VSCHEMA)
        rng = np.random.RandomState(13)
        ref = rng.rand(12, 8)
        va = coll.varrays.create(data=ref)
        view = coll.arrays.get_by_primary_attributes({"vid": va.id, "v_position": [1, 0]})
        # vgrid (3,2) on (12,8) -> chunk (1,0) covers rows 4:8, cols 0:4
        np.testing.assert_allclose(view.read_data(), ref[4:8, 0:4])
        np.testing.assert_allclose(view[1:3, 2], ref[5:7, 2])
        view.update((slice(0, 2), slice(0, 2)), np.full((2, 2), -5.0))
        ref[4:6, 0:2] = -5.0
        np.testing.assert_allclose(va.read_data(), ref)  # visible via varray

    def test_reduce_dimension(self, warehouse):
        coll = warehouse.collections.create("r", SCHEMA)
        rng = np.random.RandomState(17)
        ref = rng.rand(20, 12)
        arr = coll.arrays.create({"station": "s"}, data=ref)
        got = arr.reduce("y", "mean").toPandas().sort_values("x")["mean"].to_numpy()
        np.testing.assert_allclose(got, ref.mean(axis=1))
        got_sum = arr.reduce("x", "sum").toPandas().sort_values("y")["sum"].to_numpy()
        np.testing.assert_allclose(got_sum, ref.sum(axis=0))

    def test_varray_meta(self, warehouse):
        coll = warehouse.collections.create("v", VSCHEMA)
        va = coll.varrays.create(custom_attributes={})
        coll.varrays.update_meta_custom_attributes(va, {"note": "x"})
        assert coll.varrays.read_meta(va)["custom_attributes"]["note"] == "x"
        assert coll.varrays.get_by_id(va.id).id == va.id
        assert len(list(coll.varrays)) == 1
        coll.varrays.delete(va)
        assert coll.varrays.get_by_id(va.id) is None

    def test_vgrid_validation(self):
        with pytest.raises(DekerValidationError):
            VArraySchema(
                dtype="float64",
                dimensions=(DimensionSchema("x", 10),),
                vgrid=(3,),  # doesn't divide 10
            )


class TestDistributedLookup:
    def test_lookup_many_arrays_no_driver_listdir(self, warehouse, monkeypatch):
        """get_by_primary_attributes / __iter__ run as Spark plans over
        the catalog — os.listdir must never appear in the lookup path
        (the reference-brief scale trap at millions of arrays)."""
        import os as _os

        coll = warehouse.collections.create("many", SCHEMA)
        for i in range(12):
            coll.arrays.create({"station": f"st{i}"}, id_=f"arr{i}")

        def _banned(*a, **k):
            raise AssertionError("os.listdir called in distributed lookup path")

        monkeypatch.setattr(_os, "listdir", _banned)
        found = coll.arrays.get_by_primary_attributes({"station": "st7"})
        assert found is not None and found.id == "arr7"
        assert coll.arrays.get_by_primary_attributes({"station": "nope"}) is None
        assert coll.arrays.get_by_primary_attributes({"bogus_key": 1}) is None
        metas = list(coll.arrays)
        assert [m["id"] for m in metas] == [f"arr{i}" for i in sorted(range(12), key=lambda i: f"arr{i}")]
        assert all(m["primary_attributes"] == {"station": f"st{m['id'][3:]}"} for m in metas)

    def test_lookup_on_empty_collection(self, warehouse):
        coll = warehouse.collections.create("empty", SCHEMA)
        assert coll.arrays.get_by_primary_attributes({"station": "x"}) is None
        assert list(coll.arrays) == []


def test_write_from_cells_persist_hygiene(warehouse, spark):
    """The distributed ingest path caches its chunk-indexed input for
    the build + present-idx probe; the cache must be released when the
    write finishes (same pattern as the dedup_components fix)."""
    import numpy as np

    coll = warehouse.collections.create("ingest_hygiene", SCHEMA)
    rng = np.random.RandomState(5)
    data = rng.rand(20, 12)
    cells = spark.createDataFrame(
        [(int(x), int(y), float(data[x, y])) for x in range(20) for y in range(12)],
        "x long, y long, value double",
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    arr = coll.arrays.create_from_cells(cells, primary_attributes={"station": "sX"})
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # no-growth, not exact-zero: Spark's ContextCleaner releases other
    # tests' unreferenced caches asynchronously, so the count can DROP
    # between the two samples in a full-suite run
    assert after <= before, f"persisted RDDs grew by {after - before}"
    np.testing.assert_allclose(arr.read_data(), data)


def test_corrupt_meta_file_is_skipped(warehouse):
    """A truncated/garbage meta json must not poison the catalog scan:
    PERMISSIVE-mode corrupt records (all-null rows + _corrupt_record)
    are dropped, healthy arrays still list and resolve."""
    import os

    coll = warehouse.collections.create("weather", SCHEMA)
    a = coll.arrays.create({"station": "s1"})
    meta_dir = os.path.join(coll.path, "meta")
    with open(os.path.join(meta_dir, "zz_corrupt.json"), "w") as f:
        f.write('{"id": "broken", "primary_attr')  # truncated mid-key
    metas = list(coll.arrays)
    assert [m["id"] for m in metas] == [a.id]
    assert coll.arrays.get_by_primary_attributes({"station": "s1"}).id == a.id
