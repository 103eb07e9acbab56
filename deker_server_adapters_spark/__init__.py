"""PySpark-native analytics engine with the query and data-processing
capabilities of ``openweathermap/deker-server-adapters`` (the Deker
multidimensional-array storage adapter), re-expressed Spark-first, plus
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Layout:
- ``core/``       Deker-parity array engine (collections, arrays, varrays,
                  N-d slice read/write) on chunked parquet.
- ``sources/``    table registry + loaders.
- ``operators/``  relational / temporal / dedup / similarity / text ops.
- ``functions/``  portable (Spark<->DuckDB) hashing, vector math, text fns.
- ``plans/``      consistent hash ring, plan inspection, resource limits.
- ``streaming/``  Structured Streaming twins of the events queries.
"""

__version__ = "0.1.0"
