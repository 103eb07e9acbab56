"""Collection / array schemas.

Mirrors the Deker schema model the reference adapters serialize over
HTTP (collections carry an array schema OR a varray schema; arrays are
N-d, one dtype, with primary/custom attributes; varrays add a vgrid
that splits them into chunk arrays — see reference
collection_adapter.py:49-62 and tests/conftest.py fixtures).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from deker_server_adapters_spark.core.errors import DekerValidationError

_DTYPES = {"float64", "float32", "int64", "int32", "int16", "int8"}


@dataclass(frozen=True)
class DimensionSchema:
    name: str
    size: int

    def to_dict(self) -> dict:
        return {"name": self.name, "size": self.size}


@dataclass(frozen=True)
class AttributeSchema:
    name: str
    dtype: str = "string"  # string | int | float | tuple
    primary: bool = False

    def to_dict(self) -> dict:
        return {"name": self.name, "dtype": self.dtype, "primary": self.primary}


@dataclass(frozen=True)
class ArraySchema:
    dtype: str
    dimensions: tuple[DimensionSchema, ...]
    attributes: tuple[AttributeSchema, ...] = ()
    fill_value: float = 0.0

    def __post_init__(self) -> None:
        if self.dtype not in _DTYPES:
            raise DekerValidationError(f"unsupported dtype {self.dtype!r}")
        if not self.dimensions:
            raise DekerValidationError("at least one dimension required")
        for d in self.dimensions:
            if d.size <= 0:
                raise DekerValidationError(f"dimension {d.name!r} must have size > 0")

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(d.size for d in self.dimensions)

    @property
    def primary_attributes(self) -> tuple[AttributeSchema, ...]:
        return tuple(a for a in self.attributes if a.primary)

    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype(self.dtype)

    def to_dict(self) -> dict:
        return {
            "dtype": self.dtype,
            "dimensions": [d.to_dict() for d in self.dimensions],
            "attributes": [a.to_dict() for a in self.attributes],
            "fill_value": self.fill_value,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ArraySchema":
        return cls(
            dtype=d["dtype"],
            dimensions=tuple(DimensionSchema(**x) for x in d["dimensions"]),
            attributes=tuple(AttributeSchema(**x) for x in d["attributes"]),
            fill_value=d.get("fill_value", 0.0),
        )


@dataclass(frozen=True)
class VArraySchema(ArraySchema):
    """Array schema plus a vgrid: how many splits per dimension.

    Each vgrid cell becomes a chunk array carrying ``vid`` +
    ``v_position`` primary attributes (reference varray model;
    array_adapter.py:41-77 deletes chunk arrays by vid).
    """

    vgrid: tuple[int, ...] = field(default=())

    def __post_init__(self) -> None:
        super().__post_init__()
        if len(self.vgrid) != len(self.dimensions):
            raise DekerValidationError("vgrid rank must equal dimensions rank")
        for g, d in zip(self.vgrid, self.dimensions):
            if g <= 0 or d.size % g != 0:
                raise DekerValidationError(
                    f"vgrid {g} must evenly divide dimension {d.name!r} of size {d.size}"
                )

    @property
    def chunk_shape(self) -> tuple[int, ...]:
        return tuple(d.size // g for d, g in zip(self.dimensions, self.vgrid))

    def to_dict(self) -> dict:
        d = super().to_dict()
        d["vgrid"] = list(self.vgrid)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "VArraySchema":
        return cls(
            dtype=d["dtype"],
            dimensions=tuple(DimensionSchema(**x) for x in d["dimensions"]),
            attributes=tuple(AttributeSchema(**x) for x in d["attributes"]),
            fill_value=d.get("fill_value", 0.0),
            vgrid=tuple(d["vgrid"]),
        )


def validate_attributes(
    schema: ArraySchema, primary: dict[str, Any], custom: dict[str, Any]
) -> None:
    declared = {a.name for a in schema.attributes}
    declared_primary = {a.name for a in schema.primary_attributes}
    missing = declared_primary - set(primary)
    if missing:
        raise DekerValidationError(f"missing primary attributes: {sorted(missing)}")
    unknown = set(primary) - declared_primary
    if unknown:
        raise DekerValidationError(f"unknown primary attributes: {sorted(unknown)}")
    unknown_custom = set(custom) - (declared - declared_primary)
    if unknown_custom:
        raise DekerValidationError(f"unknown custom attributes: {sorted(unknown_custom)}")
