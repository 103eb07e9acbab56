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


def _decode_payload(
    payload: bytes, width: int, height: int, n_frames: int, codec: str = "fake"
) -> np.ndarray:
    """Codec seam: returns (n_frames, height, width) uint8 'pixels'.

    ``codec='fake'`` is the deterministic byte-expansion stub (this
    container has no media libs). ``codec='png'`` decodes REAL PNG
    bytes with the vendored pure-stdlib decoder
    (functions/pngcodec.py — 8-bit grey/RGB, all five filters),
    nearest-neighbour resampled to the declared geometry and broadcast
    across frames, so the decode stage is value-checked end to end
    without any optional dependency. ``codec='pil'`` decodes with
    Pillow when installed (grayscale, resized to the declared
    geometry, broadcast across frames) — same signature, same
    surrounding Spark plumbing, so a real deployment flips the codec
    string and nothing else. Unknown codecs raise NotImplementedError.
    """
    if codec == "fake":
        return _expand_bytes(payload, n_frames * height * width).reshape(
            n_frames, height, width
        )
    if codec == "png":
        from deker_server_adapters_spark.functions.pngcodec import (
            decode_png_gray,
            resample_nearest,
        )

        frame = decode_png_gray(payload)
        if frame.shape != (height, width):
            frame = resample_nearest(frame, height, width)
        return np.broadcast_to(frame, (n_frames, height, width)).copy()
    if codec == "pil":
        try:
            import io

            from PIL import Image  # optional dependency
        except ImportError as e:
            raise NotImplementedError(
                "codec 'pil' requires Pillow; install it or use codec='fake'"
            ) from e
        img = Image.open(io.BytesIO(payload)).convert("L").resize((width, height))
        frame = np.asarray(img, dtype=np.uint8)
        return np.broadcast_to(frame, (n_frames, height, width)).copy()
    raise NotImplementedError(f"unknown codec {codec!r}")


def decode_stage(assets: DataFrame, codec: str = "fake") -> DataFrame:
    """binary payload -> frames (flattened pixels ride as array<int>).

    Per-asset decode is inherently row-wise (variable geometry per
    row), but the batch loop walks plain NumPy column arrays — no
    pandas row objects (`iterrows` materializes a Series per row and
    was the slowest possible iteration here).
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["meta"]
            widths = np.asarray([m["width"] for m in metas], dtype=np.int64)
            heights = np.asarray([m["height"] for m in metas], dtype=np.int64)
            declared = np.asarray([m["n_frames"] for m in metas], dtype=np.int64)
            media = pdf["media_type"].to_numpy()
            frames = np.where(media == "image", 1, declared)
            pixels = [
                _decode_payload(bytes(p), int(w), int(h), int(n), codec)
                .ravel()
                .astype(np.int32)
                for p, w, h, n in zip(pdf["payload"], widths, heights, frames)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": media,
                    "width": widths.astype(np.int32),
                    "height": heights.astype(np.int32),
                    "n_frames": frames.astype(np.int32),
                    "pixels": pixels,
                }
            )

    return assets.mapInPandas(
        run,
        "doc_id long, media_type string, width int, height int, n_frames int, pixels array<int>",
    )


def frame_sample_stage(decoded: DataFrame, every_k: int = 2) -> DataFrame:
    """Keep every k-th frame of multi-frame media (video frame sampling)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths = pdf["width"].to_numpy()
            heights = pdf["height"].to_numpy()
            n_frames = pdf["n_frames"].to_numpy()
            kept_counts = np.empty(len(pdf), dtype=np.int32)
            kept_px = []
            for i, (px, w, h, n) in enumerate(
                zip(pdf["pixels"], widths, heights, n_frames)
            ):
                kept = np.asarray(px, dtype=np.int32).reshape(int(n), int(w) * int(h))[::every_k]
                kept_counts[i] = kept.shape[0]
                kept_px.append(kept.ravel())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "width": widths,
                    "height": heights,
                    "n_frames": kept_counts,
                    "pixels": kept_px,
                }
            )

    return decoded.mapInPandas(
        run,
        "doc_id long, media_type string, width int, height int, n_frames int, pixels array<int>",
    )


def resize_stage(decoded: DataFrame, target: int = _THUMB) -> DataFrame:
    """Block-mean pool every frame to target x target (thumbnail)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for px, w, h, n in zip(
                pdf["pixels"],
                pdf["width"].to_numpy(),
                pdf["height"].to_numpy(),
                pdf["n_frames"].to_numpy(),
            ):
                w, h, n = int(w), int(h), int(n)
                arr = np.asarray(px, dtype=np.float64).reshape(n, h, w)
                # crop to a multiple of target, then block-mean
                hh, ww = (h // target) * target, (w // target) * target
                arr = arr[:, :hh, :ww]
                pooled = arr.reshape(n, target, hh // target, target, ww // target).mean(axis=(2, 4))
                thumbs.append(np.round(pooled.mean(axis=0).ravel(), 4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "thumb": thumbs,
                }
            )

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
    # spread assets across the cluster before the CPU-bound decode:
    # media tables arrive as few fat files (one local split here), and
    # without this the whole decode chain runs in as many tasks as the
    # scan has splits — the classic media-pipeline bottleneck. The
    # explicit partition count matters: the asset rows are tiny (the
    # pixels don't exist yet), so AQE would coalesce a bare
    # repartition back to one task and serialize the decode.
    assets = synth_assets(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    decoded = decode_stage(assets)
    sampled = frame_sample_stage(decoded)
    resized = resize_stage(sampled)
    return feature_stage(resized)


def multimodal_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type asset report a media pipeline plans with BEFORE
    decoding anything: exact payload dedup (content-hash groups —
    duplicate binaries are pure wasted storage and decode work) and
    the DECODE BUDGET in pixels (sum of width*height*n_frames from
    the typed metadata) — the capacity number that sizes the decode
    stage. Everything derives from the binary column's content hash
    and metadata, so unlike the decode pipeline this IS
    SQL-expressible and oracle-checked. Scale shape: one
    map-side-combined groupBy on the 16-byte content hash, then a
    3-row rollup; no payload bytes ever shuffle (the hash rides, not
    the binary)."""
    assets = synth_assets(spark, sf_dir)
    # images decode exactly ONE frame (decode_stage clamps them), so
    # their budget is w*h regardless of declared n_frames — budgeting
    # the declared frames would overstate the image share (r11
    # self-review find)
    frames = F.when(F.col("media_type") == "image", F.lit(1)).otherwise(
        F.col("meta.n_frames")
    )
    per = assets.groupBy(
        # md5 of the BYTES, not the hex-doubled payload: only 32-char
        # digests shuffle, and the device survives real (large) blobs
        "media_type",
        F.md5(F.col("payload")).alias("ph"),
    ).agg(
        F.count("*").alias("n"),
        F.max(F.length("payload")).cast("long").alias("blob_bytes"),
        F.sum((F.col("meta.width") * F.col("meta.height") * frames).cast("long")).alias(
            "px"
        ),
    )
    return per.groupBy("media_type").agg(
        F.sum("n").cast("long").alias("n_assets"),
        F.count("*").cast("long").alias("n_unique"),
        F.sum(F.col("n") - 1).cast("long").alias("n_dup_assets"),
        # all payloads in a hash group are identical, so waste is
        # (copies - 1) x that group's actual blob size
        F.sum((F.col("n") - 1) * F.col("blob_bytes")).cast("long").alias("wasted_bytes"),
        F.sum("px").cast("long").alias("decode_budget_pixels"),
    )


ASSET_STATS_SQL = """
WITH a AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 + 1 AS INT) WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END AS media_type,
         -- grouping key need only be EQUALITY-equivalent to Spark's
         -- md5(payload) (ph never reaches the output): payload =
         -- unhex(md5(text)) is a bijection of md5(text), and DuckDB's
         -- md5() is VARCHAR-only anyway
         md5(text) AS ph,
         octet_length(from_hex(md5(text))) AS blob_bytes,
         (doc_id % 4 * 16 + 32) * (doc_id % 3 * 16 + 32)
           * (CASE WHEN CAST(doc_id % 3 + 1 AS INT) = 1 THEN 1 ELSE doc_id % 5 + 1 END) AS px
  FROM documents
), g AS (
  SELECT media_type, ph, count(*) AS n, max(blob_bytes) AS blob_bytes, sum(px) AS px
  FROM a GROUP BY media_type, ph
)
SELECT media_type,
       CAST(sum(n) AS BIGINT) AS n_assets,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(n - 1) AS BIGINT) AS n_dup_assets,
       CAST(sum((n - 1) * blob_bytes) AS BIGINT) AS wasted_bytes,
       CAST(sum(px) AS BIGINT) AS decode_budget_pixels
FROM g GROUP BY media_type
"""


_FRAME_BUDGET = 3  # frames fetched per video under the sampling plan


def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling SCHEDULE (r12): for every visual asset, the
    ``_FRAME_BUDGET`` uniformly-spaced frame indices the decode stage
    would fetch — first and last frames always included, interior
    slots at floor(k·(n−1)/(B−1)) — with images pinned to their single
    frame. The decode-stage work scheduler as a queryable plan: pure
    metadata arithmetic, so (unlike the decode itself) it is
    SQL-expressible and oracle-checked, one row per (asset, slot).

    Scale shape: one pass over the asset metadata, a bounded
    ≤B-element explode per row, integer-division index math — no
    payload bytes read, nothing shuffles (the groupless projection
    keeps the scan's partitioning)."""
    assets = synth_assets(spark, sf_dir).filter(F.col("media_type") != "audio")
    nf = F.when(F.col("media_type") == "image", F.lit(1)).otherwise(
        F.col("meta.n_frames")
    )
    planned = assets.select(
        "doc_id",
        "media_type",
        nf.cast("long").alias("nf"),
        F.least(F.lit(_FRAME_BUDGET), nf).cast("long").alias("bb"),
    )
    return (
        planned.select(
            "doc_id",
            "media_type",
            "nf",
            "bb",
            F.explode(F.expr("sequence(0, bb - 1)")).alias("slot"),
        )
        .select(
            "doc_id",
            "media_type",
            F.col("nf").alias("n_frames"),
            F.col("slot").cast("int").alias("slot"),
            F.when(F.col("bb") > 1, F.expr("(slot * (nf - 1)) div (bb - 1)"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("frame_idx"),
        )
    )


FRAME_PLAN_SQL = f"""
WITH a AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 + 1 AS INT) WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END AS media_type,
         CASE WHEN CAST(doc_id % 3 + 1 AS INT) = 1 THEN 1 ELSE doc_id % 5 + 1 END AS nf
  FROM documents
), p AS (
  SELECT doc_id, media_type, CAST(nf AS BIGINT) AS nf,
         CAST(least({_FRAME_BUDGET}, nf) AS BIGINT) AS bb
  FROM a WHERE media_type <> 'audio'
)
SELECT doc_id, media_type, nf AS n_frames, CAST(s.slot AS INT) AS slot,
       CAST(CASE WHEN bb > 1 THEN (s.slot * (nf - 1)) // (bb - 1) ELSE 0 END AS BIGINT) AS frame_idx
FROM p, UNNEST(range(0, bb)) s(slot)
"""


OPS = {
    "multimodal_pipeline": Op("multimodal_pipeline", multimodal_pipeline, None),
    "multimodal_frame_plan": Op(
        "multimodal_frame_plan",
        multimodal_frame_plan,
        FRAME_PLAN_SQL,
        description=(
            f"frame-sampling schedule: {_FRAME_BUDGET} uniformly-spaced "
            "frame indices per visual asset (first/last pinned) from "
            "metadata only — the decode work scheduler as an oracled "
            "plan; no payload bytes read"
        ),
    ),
    "multimodal_asset_stats": Op(
        "multimodal_asset_stats",
        multimodal_asset_stats,
        ASSET_STATS_SQL,
        description=(
            "pre-decode media planning report: exact binary dedup by "
            "content hash + decode budget in pixels per media type; "
            "hashes shuffle, payload bytes never do"
        ),
    ),
}
