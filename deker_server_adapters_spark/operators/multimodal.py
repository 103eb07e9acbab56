"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested. Two codec paths exist at the
``_decode_payload`` seam: the vendored pure-stdlib PNG codec (REAL
image bytes, used by the oracled pipeline below) and a deterministic
byte-expansion fake for payloads with no decodable container (the
container ships no media libs); swapping in PIL/librosa/av is a
one-function change.

Pipeline stages (each a separate mapInPandas so stages compose and
repartition independently, the way a production media pipeline does):

  synth assets (binary + meta) -> decode -> frame-sample -> resize
  (block-mean pool) -> feature extract (per-asset stats)

``multimodal_pipeline`` is FULLY ORACLED (r13): its synthetic source
encodes formula-derived pixels as real PNG payloads, the decode stage
inverts that encoding exactly (``decode(encode(p)) == p``), and every
downstream arithmetic step is exact dyadic float (power-of-two block
sizes), so the DuckDB twin derives the same features from the pixel
formula alone — the decode stage is value-checked end to end against
an engine that never sees the bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deker_server_adapters_spark.functions.histogram import round_ties_safe_sql
from deker_server_adapters_spark.operators import Op
from deker_server_adapters_spark.sources.tables import load_table

_MEDIA_TYPES = ["image", "audio", "video"]
_THUMB = 8  # resize target (8x8 block-mean)

# synthetic-PNG pixel formula: pixel(i, j) = (doc_id*A + i*B + j*C) % 256
# — SQL-expressible integer arithmetic, so the oracle derives the exact
# decoded bytes without a codec
_PX_A, _PX_B, _PX_C = 131, 17, 29

# Dead-letter corpus (r16): deterministic planted failure classes over
# the PNG asset table — doc_id % 13 picks the class, so the oracle can
# replay membership and the codecs' deterministic messages by
# arithmetic. Class 3: payload magic zeroed (undecodable garbage —
# sniff dispatch finds no known format). Class 7: a spec-legal but
# UNSUPPORTED 12-bit-precision JPEG header (the codec's documented
# NotImplementedError seam; chosen over progressive, which the codec
# now decodes).
_DL_BAD_MAGIC_MOD = 3
_DL_UNSUPPORTED_MOD = 7
# FFD8 + SOF0(len 11, precision 12, 8x8, 1 component (id 1, 1x1, q0))
_DL_JPEG12_STUB = bytes.fromhex("ffd8ffc0000b0c0008000801011100")
_DL_ERR_BAD_MAGIC = "unknown payload format"
_DL_ERR_UNSUPPORTED = "only 8-bit JPEG supported"


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


def synth_png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORACLED asset source: per document, real PNG bytes encoding
    the formula pixels ``(doc_id*131 + i*17 + j*29) % 256`` at a
    power-of-two-block geometry (w in {32, 64}, h in {32, 64} from
    doc_id), metadata typed per media kind. Because the pixel values
    are pure integer arithmetic on (doc_id, i, j), a SQL engine can
    reproduce the decoded image without touching the payload — which
    is what lets the whole decode pipeline be value-oracled. The
    geometry divides by the 8x8 thumbnail exactly AND by powers of
    two, so every downstream mean is an exact dyadic double (no
    cross-engine float-order hazard). Only doc_id is scanned — column
    pruning drops the text column at the parquet reader; the id rows
    are spread across the cluster BEFORE the CPU-bound encode (the
    same decode-boundary rule as the pipeline: a 1-file table scan
    would otherwise run the whole encode in one task)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deker_server_adapters_spark.functions.pngcodec import encode_png_gray

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads, metas, medias = [], [], []
            for d in ids:
                d = int(d)
                w = 32 * (1 + d % 2)
                h = 32 * (1 + (d % 4) // 2)
                i = np.arange(h, dtype=np.int64)[:, None]
                j = np.arange(w, dtype=np.int64)[None, :]
                px = ((d * _PX_A + i * _PX_B + j * _PX_C) % 256).astype(np.uint8)
                payloads.append(encode_png_gray(px))
                medias.append(_MEDIA_TYPES[d % 3])
                metas.append(
                    {"width": w, "height": h, "n_frames": d % 5 + 1, "sample_rate": 16000}
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": medias,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return docs.mapInPandas(
        gen,
        "doc_id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int>",
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
    (functions/pngcodec.py — 8-bit grey/RGB, all five filters);
    ``codec='jpeg'`` decodes REAL baseline-JPEG bytes with the
    vendored decoder (functions/jpegcodec.py — grayscale + colour to
    luma at any integer sampling layout incl. the ubiquitous 4:2:0,
    r15; JFIF YCbCr → Y plane, declared-RGB → 601 weights, r14). Both are nearest-neighbour resampled to the
    declared geometry and broadcast across frames, so the decode
    stage is value-checked end to end without any optional
    dependency. ``codec='pil'`` decodes with Pillow when installed
    (grayscale, resized to the declared geometry, broadcast across
    frames) — same signature, same surrounding Spark plumbing, so a
    real deployment flips the codec string and nothing else. Unknown
    codecs raise NotImplementedError.
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
    if codec == "jpeg":
        from deker_server_adapters_spark.functions.jpegcodec import decode_jpeg_gray
        from deker_server_adapters_spark.functions.pngcodec import resample_nearest

        frame = decode_jpeg_gray(payload)
        if frame.shape != (height, width):
            frame = resample_nearest(frame, height, width)
        return np.broadcast_to(frame, (n_frames, height, width)).copy()
    if codec == "sniff":
        # production shape: dispatch on the payload's magic bytes —
        # mixed-format corpora are the norm, the asset table rarely
        # carries a trustworthy format column
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_payload(payload, width, height, n_frames, "png")
        if payload[:2] == b"\xff\xd8":
            return _decode_payload(payload, width, height, n_frames, "jpeg")
        raise ValueError("unknown payload format")
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


def decode_stage(
    assets: DataFrame,
    codec: str = "fake",
    dead_letter: bool = False,
    emit_pixels: bool = True,
) -> DataFrame:
    """binary payload -> frames (flattened pixels ride as array<int>).

    Per-asset decode is inherently row-wise (variable geometry per
    row), but the batch loop walks plain NumPy column arrays — no
    pandas row objects (`iterrows` materializes a Series per row and
    was the slowest possible iteration here).

    ``dead_letter=True`` (r16, the quarantine contract): a corrupt or
    unsupported payload must not fail the JOB — one bad asset in a
    billion-row scan would otherwise kill hours of work. Each asset's
    decode is individually guarded; failures emit their row with
    empty pixels, ``status='declined'`` and the codec's error message
    in ``error`` (the codecs raise deterministic messages, so the
    quarantine column is oracle-able); successes carry
    ``status='ok'``. Only ValueError/NotImplementedError — the
    codecs' documented contract for bad payloads — are caught:
    anything else is a real bug and still fails loudly.

    ``emit_pixels=False`` (r17, dead-letter only): consumers that read
    only the verdict columns (``multimodal_asset_stats``'s
    ``declined_frac``) must not ship every decoded frame back across
    the Arrow boundary — Catalyst cannot prune columns through an
    opaque mapInPandas, so the pixel arrays (h*w*n_frames int32 per
    asset) would serialize JVM-ward only to be dropped. The decode is
    still attempted per asset exactly as before (same codec calls,
    same guarded seam, same status/error values); only the pixel
    materialization and transfer are skipped."""
    if not emit_pixels and not dead_letter:
        raise ValueError("emit_pixels=False requires dead_letter=True")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["meta"]
            widths = np.asarray([m["width"] for m in metas], dtype=np.int64)
            heights = np.asarray([m["height"] for m in metas], dtype=np.int64)
            declared = np.asarray([m["n_frames"] for m in metas], dtype=np.int64)
            media = pdf["media_type"].to_numpy()
            frames = np.where(media == "image", 1, declared)
            if not dead_letter:
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
                continue
            pixels, status, error = [], [], []
            for p, w, h, n in zip(pdf["payload"], widths, heights, frames):
                try:
                    px = _decode_payload(bytes(p), int(w), int(h), int(n), codec)
                    if emit_pixels:
                        pixels.append(px.ravel().astype(np.int32))
                    status.append("ok")
                    error.append(None)
                except (ValueError, NotImplementedError) as e:
                    if emit_pixels:
                        pixels.append(np.zeros(0, dtype=np.int32))
                    status.append("declined")
                    error.append(str(e))
            out = {
                "doc_id": pdf["doc_id"].to_numpy(),
                "media_type": media,
                "width": widths.astype(np.int32),
                "height": heights.astype(np.int32),
                "n_frames": frames.astype(np.int32),
                "status": status,
                "error": error,
            }
            if emit_pixels:
                out["pixels"] = pixels
            yield pd.DataFrame(out)

    schema = "doc_id long, media_type string, width int, height int, n_frames int"
    if emit_pixels:
        schema += ", pixels array<int>"
    if dead_letter:
        schema += ", status string, error string"
    return assets.mapInPandas(run, schema)


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
                # raw means, NOT rounded here (r13): rounding is the
                # feature stage's job, via the cross-engine tie-safe
                # form — np.round's banker's ties would diverge from
                # the oracle's floor(x*1e4 + 0.5) on dyadic block means
                thumbs.append(pooled.mean(axis=0).ravel())
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
    (aggregate/transform over the array), no Python. Output rounding
    is the cross-engine tie-safe form (floor(x*1e4 + 0.5)/1e4) so the
    oracled pipeline's features are bit-identical to DuckDB's."""
    n = _THUMB * _THUMB
    mean = f"aggregate(thumb, 0.0D, (a, x) -> a + x) / {n}"
    std = f"sqrt(aggregate(thumb, 0.0D, (a, x) -> a + (x - ({mean})) * (x - ({mean}))) / {n})"
    return resized.select(
        "doc_id",
        "media_type",
        F.expr(round_ties_safe_sql(mean, 4)).alias("px_mean"),
        F.expr(round_ties_safe_sql(std, 4)).alias("px_std"),
        F.expr(round_ties_safe_sql("array_min(thumb)", 4)).alias("px_min"),
        F.expr(round_ties_safe_sql("array_max(thumb)", 4)).alias("px_max"),
    )


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship decode pipeline, fully oracled (r13): real PNG
    payloads -> vendored decode -> frame-sample -> 8x8 block-mean
    resize -> per-asset feature stats. The PNG frames are identical
    across an asset's n_frames (one still image broadcast — the video
    plumbing is exercised, and the mean over identical frames is
    exactly the single frame), so the DuckDB twin reproduces the
    features from the pixel FORMULA alone: every engine-side value is
    an exact dyadic double (integer pixels, power-of-two block sizes),
    making the parity bit-exact and order-independent.

    Scale notes: the source spreads the id rows across the cluster
    BEFORE the CPU-bound encode (synth_png_assets), and decode/sample/
    resize inherit that explicit partitioning — asset rows are tiny
    before pixels exist, so AQE would coalesce a bare repartition back
    to one task and serialize the chain (the classic media-pipeline
    bottleneck, measured at 9.3 -> 1.9 s in PERF.md). Each stage is
    its own Arrow-batched mapInPandas; only doc_id is scanned from
    parquet."""
    assets = synth_png_assets(spark, sf_dir)
    decoded = decode_stage(assets, codec="png")
    sampled = frame_sample_stage(decoded)
    resized = resize_stage(sampled)
    return feature_stage(resized)


PIPELINE_SQL = f"""
WITH a AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 + 1 AS INT) WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END AS media_type,
         32 * (1 + doc_id % 2) AS w,
         32 * (1 + (doc_id % 4) // 2) AS h
  FROM documents
), px AS (
  -- the decoded image, derived from the pixel formula (the engine
  -- never sees the PNG bytes; decode(encode(p)) == p is the device)
  SELECT doc_id, media_type, w, h, i.i AS i, j.j AS j,
         CAST((doc_id * {_PX_A} + i.i * {_PX_B} + j.j * {_PX_C}) % 256 AS DOUBLE) AS v
  FROM a, UNNEST(range(0, h)) i(i), UNNEST(range(0, w)) j(j)
), th AS (
  -- 8x8 block-mean thumbnail: block sizes are powers of two, so every
  -- avg is an exact dyadic double (order-independent)
  SELECT doc_id, media_type, i // (h // {_THUMB}) AS bi, j // (w // {_THUMB}) AS bj,
         avg(v) AS t
  FROM px GROUP BY doc_id, media_type, h, w, bi, bj
), mu AS (
  SELECT doc_id, media_type, avg(t) AS m, min(t) AS tmin, max(t) AS tmax
  FROM th GROUP BY doc_id, media_type
), dev AS (
  SELECT th.doc_id, avg((t - m) * (t - m)) AS var
  FROM th JOIN mu ON mu.doc_id = th.doc_id
  GROUP BY th.doc_id
)
SELECT mu.doc_id AS doc_id, mu.media_type AS media_type,
       {round_ties_safe_sql("m", 4)} AS px_mean,
       {round_ties_safe_sql("sqrt(var)", 4)} AS px_std,
       {round_ties_safe_sql("tmin", 4)} AS px_min,
       {round_ties_safe_sql("tmax", 4)} AS px_max
FROM mu JOIN dev ON dev.doc_id = mu.doc_id
"""


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
    the binary).

    r16: + ``declined_frac`` — the fraction of each media type's
    assets the dead-letter decode pass DECLINES, measured by actually
    running ``decode_stage(dead_letter=True)`` over the mixed-health
    corpus (``dl_assets``) — real decode evidence, not metadata
    arithmetic; the oracle replays the planted class membership the
    declines deterministically follow."""
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
    report = per.groupBy("media_type").agg(
        F.sum("n").cast("long").alias("n_assets"),
        F.count("*").cast("long").alias("n_unique"),
        F.sum(F.col("n") - 1).cast("long").alias("n_dup_assets"),
        # all payloads in a hash group are identical, so waste is
        # (copies - 1) x that group's actual blob size
        F.sum((F.col("n") - 1) * F.col("blob_bytes")).cast("long").alias("wasted_bytes"),
        F.sum("px").cast("long").alias("decode_budget_pixels"),
    )
    from deker_server_adapters_spark.functions.histogram import round_ties_safe

    declined = (
        decode_stage(
            dl_assets(spark, sf_dir), codec="sniff", dead_letter=True, emit_pixels=False
        )
        .groupBy("media_type")
        .agg(
            round_ties_safe(
                F.sum(F.when(F.col("status") == "declined", 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("declined_frac")
        )
    )
    return report.join(declined, "media_type", "left")


ASSET_STATS_SQL = f"""
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
), decl AS (
  -- the dead-letter decode declines exactly the planted classes
  SELECT media_type,
         {round_ties_safe_sql(
             f"CAST(sum(CASE WHEN doc_id % 13 IN ({_DL_BAD_MAGIC_MOD}, {_DL_UNSUPPORTED_MOD}) THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
             4,
         )} AS declined_frac
  FROM a GROUP BY media_type
)
SELECT g.media_type AS media_type,
       CAST(sum(n) AS BIGINT) AS n_assets,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(n - 1) AS BIGINT) AS n_dup_assets,
       CAST(sum((n - 1) * blob_bytes) AS BIGINT) AS wasted_bytes,
       CAST(sum(px) AS BIGINT) AS decode_budget_pixels,
       any_value(declined_frac) AS declined_frac
FROM g JOIN decl ON decl.media_type = g.media_type
GROUP BY g.media_type
"""


def dl_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``synth_png_assets`` with the planted failure classes applied
    as pure column surgery (binary substring/concat — no second
    Python pass): class-3 payloads get their 8 magic bytes zeroed,
    class-7 payloads become the 12-bit JPEG stub."""
    assets = synth_png_assets(spark, sf_dir)
    return assets.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % 13 == _DL_BAD_MAGIC_MOD,
            F.concat(F.lit(b"\x00" * 8), F.expr("substring(payload, 9)")),
        )
        .when(F.col("doc_id") % 13 == _DL_UNSUPPORTED_MOD, F.lit(_DL_JPEG12_STUB))
        .otherwise(F.col("payload")),
    )


def multimodal_pipeline_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline over a MIXED-health corpus (r16): sniff
    dispatch + per-asset dead-letter guard, good assets flow through
    frame-sample -> resize -> features exactly as
    ``multimodal_pipeline``, corrupt/unsupported assets land in the
    quarantine rows of the SAME output (status='declined', the
    codec's deterministic error message, NULL features) instead of
    failing the job. One row per asset either way — the shape a
    100-TB media scan needs, where a single bad blob must cost one
    row, not the job.

    Fully oracled: good-row features replay from the pixel formula
    (the ``multimodal_pipeline`` device), quarantine membership and
    messages replay from the doc_id % 13 class arithmetic."""
    decoded = decode_stage(dl_assets(spark, sf_dir), codec="sniff", dead_letter=True)
    good = decoded.filter(F.col("status") == "ok").drop("status", "error")
    feats = feature_stage(resize_stage(frame_sample_stage(good)))
    ok_rows = feats.select(
        "doc_id",
        "media_type",
        F.lit("ok").alias("status"),
        F.lit(None).cast("string").alias("error"),
        "px_mean",
        "px_std",
        "px_min",
        "px_max",
    )
    quarantine = decoded.filter(F.col("status") == "declined").select(
        "doc_id",
        "media_type",
        "status",
        "error",
        F.lit(None).cast("double").alias("px_mean"),
        F.lit(None).cast("double").alias("px_std"),
        F.lit(None).cast("double").alias("px_min"),
        F.lit(None).cast("double").alias("px_max"),
    )
    return ok_rows.unionByName(quarantine)


DL_PIPELINE_SQL = f"""
WITH a AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 + 1 AS INT) WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END AS media_type,
         32 * (1 + doc_id % 2) AS w,
         32 * (1 + (doc_id % 4) // 2) AS h
  FROM documents
), good AS (
  SELECT * FROM a WHERE doc_id % 13 NOT IN ({_DL_BAD_MAGIC_MOD}, {_DL_UNSUPPORTED_MOD})
), px AS (
  SELECT doc_id, media_type, w, h, i.i AS i, j.j AS j,
         CAST((doc_id * {_PX_A} + i.i * {_PX_B} + j.j * {_PX_C}) % 256 AS DOUBLE) AS v
  FROM good, UNNEST(range(0, h)) i(i), UNNEST(range(0, w)) j(j)
), th AS (
  SELECT doc_id, media_type, i // (h // {_THUMB}) AS bi, j // (w // {_THUMB}) AS bj,
         avg(v) AS t
  FROM px GROUP BY doc_id, media_type, h, w, bi, bj
), mu AS (
  SELECT doc_id, media_type, avg(t) AS m, min(t) AS tmin, max(t) AS tmax
  FROM th GROUP BY doc_id, media_type
), dev AS (
  SELECT th.doc_id, avg((t - m) * (t - m)) AS var
  FROM th JOIN mu ON mu.doc_id = th.doc_id
  GROUP BY th.doc_id
)
SELECT mu.doc_id AS doc_id, mu.media_type AS media_type,
       'ok' AS status, CAST(NULL AS VARCHAR) AS error,
       {round_ties_safe_sql("m", 4)} AS px_mean,
       {round_ties_safe_sql("sqrt(var)", 4)} AS px_std,
       {round_ties_safe_sql("tmin", 4)} AS px_min,
       {round_ties_safe_sql("tmax", 4)} AS px_max
FROM mu JOIN dev ON dev.doc_id = mu.doc_id
UNION ALL
SELECT doc_id, media_type, 'declined' AS status,
       CASE WHEN doc_id % 13 = {_DL_BAD_MAGIC_MOD} THEN '{_DL_ERR_BAD_MAGIC}'
            ELSE '{_DL_ERR_UNSUPPORTED}' END AS error,
       CAST(NULL AS DOUBLE) AS px_mean, CAST(NULL AS DOUBLE) AS px_std,
       CAST(NULL AS DOUBLE) AS px_min, CAST(NULL AS DOUBLE) AS px_max
FROM a WHERE doc_id % 13 IN ({_DL_BAD_MAGIC_MOD}, {_DL_UNSUPPORTED_MOD})
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
    "multimodal_pipeline": Op(
        "multimodal_pipeline",
        multimodal_pipeline,
        PIPELINE_SQL,
        description=(
            "decode -> frame-sample -> block-mean resize -> feature "
            "stats over real PNG payloads via the vendored codec; "
            "oracled end to end (the DuckDB twin re-derives decoded "
            "pixels from the synthetic source's formula)"
        ),
    ),
    "multimodal_pipeline_dead_letter": Op(
        "multimodal_pipeline_dead_letter",
        multimodal_pipeline_dead_letter,
        DL_PIPELINE_SQL,
        description=(
            "decode pipeline over a mixed-health corpus: sniff "
            "dispatch + per-asset dead-letter guard — corrupt/"
            "unsupported payloads become quarantine rows (status, "
            "deterministic error message, NULL features) instead of "
            "failing the job; good rows match multimodal_pipeline"
        ),
    ),
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
            "hashes shuffle, payload bytes never do; + measured "
            "dead-letter declined fraction per media type (r16)"
        ),
    ),
}
