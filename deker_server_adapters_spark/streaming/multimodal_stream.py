"""Structured Streaming twin of ``multimodal_pipeline`` (r13).

Media ingest as a stream: binary assets arrive as files, and the SAME
Arrow-batched stages the batch pipeline composes (decode ->
frame-sample -> block-mean resize -> feature stats) run over the
stream — ``mapInPandas`` and the Catalyst feature expressions are
stateless row transforms, so they apply to a streaming DataFrame
unchanged, and the drained per-asset features equal the batch op's
bit for bit (every stage is deterministic per row; no watermark or
state is needed). This is the production media-ingest shape: a
landing bucket of asset files feeds decode workers incrementally
instead of as one giant batch job.

Scale notes: per-micro-batch parallelism comes from the file source's
split partitioning (the batch pipeline's explicit pre-decode
repartition exists because its SOURCE is a 1-file synthesized scan;
a stream's decode parallelism is per-trigger file count x splits —
size maxFilesPerTrigger to keep decode workers busy). State: none —
the whole chain is stateless, so the stream's memory is one
micro-batch of decoded pixels.

Trigger sizing rule (r14): a FILE-count trigger leaves per-trigger
decode cost unbounded by BYTES — one trigger can land many large
assets and stall the micro-batch (decode wall is ~linear in payload
bytes, and a micro-batch's decoded-pixel memory is bytes-propor-
tional too). Size the trigger by bytes instead:
``maxBytesPerTrigger ~= target_trigger_seconds x measured_decode_
bytes_per_second`` (Spark's file source takes the option natively;
it admits files until the byte budget is crossed, always at least
one). ``stream_assets_source(max_bytes_per_trigger=...)`` exposes
it; the two options are mutually exclusive in Spark, so the byte
form REPLACES the file form when set. Measured datapoint in
docs/PERF.md (r14): the sf0.1 asset table's decode stage runs
~bytes-linear, so a byte budget bounds both trigger latency and
peak decoded-pixel memory where a file budget bounds neither.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)


def stream_assets_source(
    spark, sf_dir: str, n_files: int = 3, max_bytes_per_trigger: "int | None" = None
) -> DataFrame:
    """File-stream over the synthetic PNG asset table (the batch
    pipeline's oracled source), staged as ``n_files`` doc_id-ranged
    files — one per micro-batch under maxFilesPerTrigger=1, or
    byte-budgeted micro-batches under ``max_bytes_per_trigger`` (the
    module-docstring sizing rule: bytes bound decode wall and decoded-
    pixel memory; file counts bound neither). The options are mutually
    exclusive in Spark's file source, so the byte form replaces the
    file form when set."""
    from deker_server_adapters_spark.operators.multimodal import synth_png_assets
    from deker_server_adapters_spark.sources.scratch import staged_dir

    stream_dir, staged = staged_dir("deker_asset_stream_", sf_dir, n_files)
    if not staged:
        synth_png_assets(spark, sf_dir).repartitionByRange(
            n_files, "doc_id"
        ).write.mode("overwrite").parquet(stream_dir)
    reader = spark.readStream.schema(ASSET_STREAM_SCHEMA)
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", int(max_bytes_per_trigger))
    else:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(stream_dir)


def streaming_multimodal_features(assets: DataFrame) -> DataFrame:
    """The batch pipeline's stage composition applied to the asset
    stream — literally the same stage functions, so stream == batch is
    structural, not re-implemented."""
    from deker_server_adapters_spark.operators.multimodal import (
        decode_stage,
        feature_stage,
        frame_sample_stage,
        resize_stage,
    )

    return feature_stage(resize_stage(frame_sample_stage(decode_stage(assets, codec="png"))))
