"""Labeled and time dimensions: Deker's dimension model — index by
label string or datetime, label slice endpoints inclusive."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from deker_server_adapters_spark.core import (
    ArraySchema,
    DimensionSchema,
    Warehouse,
)
from deker_server_adapters_spark.core.errors import DekerValidationError

LAYERS = ("surface", "low", "mid", "high")

SCHEMA = ArraySchema(
    dtype="float64",
    dimensions=(
        DimensionSchema("t", 24, start_iso="2024-01-01T00:00:00", step_seconds=3600),
        DimensionSchema("layer", 4, labels=LAYERS),
    ),
)


def test_label_validation():
    with pytest.raises(DekerValidationError):
        DimensionSchema("x", 3, labels=("a", "b"))
    with pytest.raises(DekerValidationError):
        DimensionSchema("x", 3, start_iso="2024-01-01")  # step missing


def test_index_of():
    t, layer = SCHEMA.dimensions
    assert layer.index_of("mid") == 2
    assert t.index_of("2024-01-01T05:00:00") == 5
    assert t.index_of(datetime(2024, 1, 1, 7)) == 7
    with pytest.raises(DekerValidationError):
        layer.index_of("nope")
    with pytest.raises(DekerValidationError):
        t.index_of("2024-01-01T05:30:00")  # off-grid
    with pytest.raises(DekerValidationError):
        t.index_of("2024-01-02T05:00:00")  # out of range


def test_schema_roundtrip():
    again = ArraySchema.from_dict(SCHEMA.to_dict())
    assert again == SCHEMA


def test_read_by_labels_and_time(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    coll = wh.collections.create("weather", SCHEMA)
    rng = np.random.RandomState(11)
    ref = rng.rand(24, 4)
    arr = coll.arrays.create(data=ref)
    # label index + time index
    np.testing.assert_allclose(arr["2024-01-01T05:00:00", "mid"], ref[5, 2])
    # label slice endpoints are inclusive
    np.testing.assert_allclose(
        arr[slice("2024-01-01T03:00:00", "2024-01-01T06:00:00"), slice("low", "high")],
        ref[3:7, 1:4],
    )
    # update through labels
    arr.update((slice(None), "surface"), np.full(24, 9.0))
    ref[:, 0] = 9.0
    np.testing.assert_allclose(arr.read_data(), ref)
