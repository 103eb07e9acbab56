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


def stream_assets_source(spark, sf_dir: str, n_files: int = 3) -> DataFrame:
    """File-stream over the synthetic PNG asset table (the batch
    pipeline's oracled source), staged as ``n_files`` doc_id-ranged
    files — one per micro-batch under maxFilesPerTrigger=1."""
    from deker_server_adapters_spark.operators.multimodal import synth_png_assets
    from deker_server_adapters_spark.sources.scratch import staged_dir

    stream_dir, staged = staged_dir("deker_asset_stream_", sf_dir, n_files)
    if not staged:
        synth_png_assets(spark, sf_dir).repartitionByRange(
            n_files, "doc_id"
        ).write.mode("overwrite").parquet(stream_dir)
    return (
        spark.readStream.schema(ASSET_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )


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
