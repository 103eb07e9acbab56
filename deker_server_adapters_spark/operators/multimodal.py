"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the codec layer is stubbed: the
container has no image/audio libs, so ``decode`` falls back to a
deterministic byte-expansion fake (same seed -> same pixels). Swapping
in PIL/librosa/av is a one-function change (see ``_decode_payload``).

Pipeline stages (each a separate mapInPandas so stages compose and
repartition independently, the way a production media pipeline does):

  synth assets (binary + meta) -> decode -> resize (block-mean pool)
  -> feature extract (per-channel stats) / frame-sample for video

``multimodal_pipeline`` registers as a rows-only queries() entry (no
SQL oracle can decode bytes); determinism + shape are pytest-checked.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deker_server_adapters_spark.operators import Op
from deker_server_adapters_spark.sources.tables import load_table

_MEDIA_TYPES = ["image", "audio", "video"]
_THUMB = 8  # resize target (8x8 block-mean)


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic binary-asset table derived from documents:
    payload = md5-chain bytes of the doc text; metadata typed per
    media kind. Stands in for 'parquet with a binary column'."""
    docs = load_table(spark, sf_dir, "documents")
    media = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        media.alias("media_type"),
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            (F.col("doc_id") % 4 * 16 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 3 * 16 + 32).cast("int").alias("height"),
            (F.col("doc_id") % 5 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _expand_bytes(seed: bytes, n: int) -> np.ndarray:
    """Deterministic byte expansion (md5 counter mode) — the codec fake."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def _decode_payload(payload: bytes, width: int, height: int, n_frames: int) -> np.ndarray:
    """STUB codec: returns (n_frames, height, width) uint8 'pixels'.

    A real deployment replaces this body with PIL.Image.open /
    librosa.load / av.open — the surrounding Spark plumbing is
    unchanged. Raises NotImplementedError for unknown payloads only in
    the real-codec path; the fake accepts anything deterministically.
    """
    return _expand_bytes(payload, n_frames * height * width).reshape(n_frames, height, width)


def decode_stage(assets: DataFrame) -> DataFrame:
    """binary payload -> frames (flattened pixels ride as array<int>)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r["meta"]
                frames = 1 if r["media_type"] == "image" else int(m["n_frames"])
                px = _decode_payload(bytes(r["payload"]), int(m["width"]), int(m["height"]), frames)
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "media_type": r["media_type"],
                        "width": int(m["width"]),
                        "height": int(m["height"]),
                        "n_frames": frames,
                        "pixels": px.ravel().astype(np.int32),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "n_frames", "pixels"]
            )

    return assets.mapInPandas(
        run,
        "doc_id long, media_type string, width int, height int, n_frames int, pixels array<int>",
    )


def frame_sample_stage(decoded: DataFrame, every_k: int = 2) -> DataFrame:
    """Keep every k-th frame of multi-frame media (video frame sampling)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fsz = r["width"] * r["height"]
                px = np.asarray(r["pixels"], dtype=np.int32).reshape(r["n_frames"], fsz)
                kept = px[::every_k]
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "media_type": r["media_type"],
                        "width": r["width"],
                        "height": r["height"],
                        "n_frames": kept.shape[0],
                        "pixels": kept.ravel(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "n_frames", "pixels"]
            )

    return decoded.mapInPandas(
        run,
        "doc_id long, media_type string, width int, height int, n_frames int, pixels array<int>",
    )


def resize_stage(decoded: DataFrame, target: int = _THUMB) -> DataFrame:
    """Block-mean pool every frame to target x target (thumbnail)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, n = int(r["width"]), int(r["height"]), int(r["n_frames"])
                px = np.asarray(r["pixels"], dtype=np.float64).reshape(n, h, w)
                # crop to a multiple of target, then block-mean
                hh, ww = (h // target) * target, (w // target) * target
                px = px[:, :hh, :ww]
                pooled = px.reshape(n, target, hh // target, target, ww // target).mean(axis=(2, 4))
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "media_type": r["media_type"],
                        "thumb": np.round(pooled.mean(axis=0).ravel(), 4),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "thumb"])

    return decoded.mapInPandas(run, "doc_id long, media_type string, thumb array<double>")


def feature_stage(resized: DataFrame) -> DataFrame:
    """Per-asset feature stats over the thumbnail — pure Catalyst
    (aggregate/transform over the array), no Python."""
    n = _THUMB * _THUMB
    mean = f"aggregate(thumb, 0.0D, (a, x) -> a + x) / {n}"
    return resized.select(
        "doc_id",
        "media_type",
        F.expr(f"round({mean}, 4)").alias("px_mean"),
        F.expr(
            f"round(sqrt(aggregate(thumb, 0.0D, (a, x) -> a + (x - ({mean})) * (x - ({mean}))) / {n}), 4)"
        ).alias("px_std"),
        F.expr("round(array_min(thumb), 4)").alias("px_min"),
        F.expr("round(array_max(thumb), 4)").alias("px_max"),
    )


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synth_assets(spark, sf_dir)
    decoded = decode_stage(assets)
    sampled = frame_sample_stage(decoded)
    resized = resize_stage(sampled)
    return feature_stage(resized)


OPS = {
    "multimodal_pipeline": Op("multimodal_pipeline", multimodal_pipeline, None),
}
