from deker_server_adapters_spark.core.schema import (
    ArraySchema,
    AttributeSchema,
    DimensionSchema,
    VArraySchema,
)
from deker_server_adapters_spark.core.collection import Collection, CollectionAdapter, Warehouse
from deker_server_adapters_spark.core.array import Array, ArrayAdapter
from deker_server_adapters_spark.core.varray import VArray, VArrayAdapter

__all__ = [
    "ArraySchema",
    "AttributeSchema",
    "DimensionSchema",
    "VArraySchema",
    "Collection",
    "CollectionAdapter",
    "Warehouse",
    "Array",
    "ArrayAdapter",
    "VArray",
    "VArrayAdapter",
]
