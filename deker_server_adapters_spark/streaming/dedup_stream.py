"""Structured Streaming twin of ``docs_incremental_dedup``.

The batch op (operators/dedup.py) verdicts a daily DELTA of new
documents against the already-deduped corpus: exact tier (normalized
md5 equi-match against the old hash->min-id table) and near tier
(minhash band keys, new bands probe old bands only, signature
agreement >= 0.5). Here the corpus index is MAINTAINED AS KEYED STATE
and new documents arrive in micro-batches — the continuous form of the
same job: after draining, the assembled verdict set equals the batch
op exactly (tests/test_streaming.py drives both and compares).

Shape, mirrored from the batch op:

- normalization, md5, shingling, and the Carter-Wegman minhash maps
  all run JVM-side BEFORE the stateful stage (the same expressions the
  batch op compiles) — Python never hashes, it only compares
  signatures already in state;
- state is keyed by (kind, key): kind -1 holds the exact tier's
  min-old-id per text hash; kind b in [0, n_bands) holds the old ids +
  full signatures indexed under that band key. Per-key near-tier state
  is the band's OLD occupancy — the same bounded fan-out the batch
  band join has; total state = the old corpus's hash table plus
  n_bands copies of (id, signature), the standard streaming-LSH memory
  price (RocksDB-backed in production; sizing row in docs/PERF.md);
- exactly-once without a second stateful stage: a (new, old) pair
  agreeing in several bands is emitted only from its FIRST agreeing
  band (both signatures are static, so the canonical band is the same
  wherever the pair becomes visible — the batch op's own pair-dedup
  device, and the min-shared-cell trick of the threshold-join stream);
- the exact tier emits one row per NEW doc ALWAYS (dup_of NULL when
  unseen), so unique docs surface in the verdict assembly without a
  streaming outer join;
- old documents must be indexed before a new document probes: the
  staged file source orders the corpus file(s) ahead of the delta
  files by modification time (arrival order IS the day boundary the
  batch op's doc_id%5 split encodes). Within a micro-batch the state
  function processes old rows first, so a mixed batch is safe.

Like the batch op, verdicted new documents are NOT added to the index
(new-new pairs are out of contract). A production variant that admits
accepted uniques into the corpus flips one branch in ``_update`` —
noted here so the design decision is explicit, not accidental.

``incremental_verdicts_from_matches`` is the downstream reducer: a
plain batch aggregation from the emitted match rows to the batch op's
(doc_id, exact_dup_of, near_dup_of, verdict) rows — in production it
runs over the sink table per day; in the test it runs over the drained
memory sink.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from deker_server_adapters_spark.operators.dedup import (
    _BAND_SIZE,
    _MH_A,
    _MH_B,
    _MH_P,
    _MINHASH_K,
    _NORM,
    _SHINGLE_N,
)

DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("is_new", BooleanType()),
    ]
)

_N_BANDS = _MINHASH_K // _BAND_SIZE


def stream_documents_source(spark, sf_dir: str, n_new_files: int = 2) -> DataFrame:
    """File-stream over the documents table staged for incremental
    dedup: the OLD corpus (doc_id % 5 != 4) lands in the earliest
    file, the NEW delta (doc_id % 5 == 4) splits into ``n_new_files``
    later files — modification times strictly ascending so the file
    source (maxFilesPerTrigger=1, oldest first) replays the corpus
    before any delta micro-batch."""
    import glob
    import os
    import shutil

    from deker_server_adapters_spark.sources.scratch import scratch_dir, staged_dir
    from deker_server_adapters_spark.sources.tables import load_table

    stream_dir, staged = staged_dir("deker_docs_incr_stream_", sf_dir, n_new_files)
    if not staged:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", ((F.col("doc_id") % 5) == 4).alias("is_new")
        )
        tmp = scratch_dir("deker_docs_incr_build_")
        docs.filter(~F.col("is_new")).coalesce(1).write.mode("overwrite").parquet(
            tmp + "/old"
        )
        docs.filter(F.col("is_new")).repartitionByRange(
            n_new_files, "doc_id"
        ).write.mode("overwrite").parquet(tmp + "/new")
        staged_files = sorted(glob.glob(tmp + "/old/part-*.parquet")) + sorted(
            glob.glob(tmp + "/new/part-*.parquet")
        )
        base = 1_000_000_000  # fixed epoch: deterministic ordering, no clock read
        for i, src in enumerate(staged_files):
            dst = os.path.join(stream_dir, f"{i:04d}.parquet")
            shutil.copyfile(src, dst)
            os.utime(dst, (base + 60 * i, base + 60 * i))
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )


def _keyed_rows(docs: DataFrame) -> DataFrame:
    """(kind, key, doc_id, is_new, sig): the JVM-side projection of the
    batch op's two tiers — kind -1 carries the exact-tier text hash,
    kind b carries band b's key with the full signature riding."""
    toks = docs.select(
        "doc_id", "is_new", F.expr(f"md5({_NORM})").alias("th"), F.expr(f"split({_NORM}, ' ')").alias("t")
    )
    sh = toks.select(
        "doc_id",
        "is_new",
        "th",
        F.expr(
            f"transform(sequence(1, greatest(size(t) - {_SHINGLE_N - 1}, 1)), "
            f"i -> array_join(slice(t, i, {_SHINGLE_N}), ' '))"
        ).alias("shingles"),
    )
    hv = sh.select(
        "doc_id",
        "is_new",
        "th",
        F.expr(
            "transform(shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT))"
        ).alias("hv"),
    )
    mins = ", ".join(
        f"array_min(transform(hv, h -> ({_MH_A[k]} * h + {_MH_B[k]}) % {_MH_P}))"
        for k in range(_MINHASH_K)
    )
    sigs = hv.select("doc_id", "is_new", "th", F.expr(f"array({mins})").alias("sig"))
    entries = F.array(
        F.struct(
            F.lit(-1).cast("int").alias("kind"), F.col("th").alias("key")
        ),
        *[
            F.struct(
                F.lit(b).cast("int").alias("kind"),
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * _BAND_SIZE + i].cast("string")
                        for i in range(_BAND_SIZE)
                    ],
                ).alias("key"),
            )
            for b in range(_N_BANDS)
        ],
    )
    return sigs.select(
        "doc_id", "is_new", "sig", F.explode(entries).alias("e")
    ).select("doc_id", "is_new", "sig", F.col("e.kind").alias("kind"), F.col("e.key").alias("key"))


def _first_agreeing_band(sig, osig) -> int:
    for b in range(_N_BANDS):
        if all(sig[b * _BAND_SIZE + i] == osig[b * _BAND_SIZE + i] for i in range(_BAND_SIZE)):
            return b
    return -1  # unreachable for same-key pairs (key equality IS agreement)


# per-band-key state occupancy past which the update fn logs a warning
# (r12 advice): band state (ids + full signatures) deserializes into
# Python lists per trigger, so a pathological hot band key — e.g. many
# identical boilerplate docs all hashing to one band value — grows both
# the state row and the per-trigger group without bound. The log makes
# the hot key visible BEFORE it becomes an executor OOM; the production
# mitigations (cap the key's id list, or route boilerplate through the
# exact-hash tier first) are corpus decisions, not defaults.
_HOT_BAND_WARN = 4096


def streaming_incremental_dedup(docs: DataFrame) -> DataFrame:
    """Match-row stream: (doc_id, tier, dup_of, est) for every NEW
    document — one 'exact' row always (dup_of NULL when no old doc
    shares the text hash) plus one 'near' row per old doc whose
    signature agreement clears 0.5, emitted exactly once via the
    first-agreeing-band canonical device. Feed the drained output to
    ``incremental_verdicts_from_matches`` for batch-identical
    verdicts.

    Memory price (documented): each band key's state row holds every
    old doc id + 12-long signature indexed under it, rebuilt as Python
    lists per update call; occupancy past ``_HOT_BAND_WARN`` logs a
    hot-key warning on the executor."""
    import logging

    import pandas as pd

    keyed = _keyed_rows(docs)
    out_schema = "doc_id long, tier string, dup_of long, est double"
    state_schema = "min_old long, ids array<long>, sigs array<array<long>>"

    def update(key, pdfs, state):
        min_old, ids, sigs = state.get if state.exists else (None, [], [])
        ids, sigs = list(ids), list(sigs)
        kind = key[0]
        rows = []
        # Materialize the WHOLE key-group before sorting: pdfs is an
        # iterator of Arrow chunks (split at maxRecordsPerBatch), and a
        # per-chunk sort would let a new doc in an early chunk probe
        # before an old doc in a later chunk indexes — the mixed-batch
        # invariant must hold across chunks, not per chunk (r12
        # self-review find). Group size is the key's band/hash
        # occupancy — the same bound the state payload already carries.
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            # old rows index BEFORE new rows probe; then by doc_id for a
            # deterministic trace
            pdf = whole.sort_values(["is_new", "doc_id"]).reset_index(drop=True)
            for vid, new, sig in zip(pdf["doc_id"], pdf["is_new"], pdf["sig"]):
                vid = int(vid)
                if not new:
                    if kind == -1:
                        min_old = vid if min_old is None else min(min_old, vid)
                    else:
                        ids.append(vid)
                        sigs.append([int(x) for x in sig])
                    continue
                if kind == -1:
                    rows.append((vid, "exact", min_old, None))
                    continue
                sig = [int(x) for x in sig]
                for oid, osig in zip(ids, sigs):
                    if _first_agreeing_band(sig, osig) != kind:
                        continue  # another band is this pair's canonical emitter
                    agree = sum(1 for x, y in zip(sig, osig) if x == y)
                    # the batch op's round_ties_safe(agree/K, 4), same IEEE ops
                    est = math.floor((agree / float(_MINHASH_K)) * 1e4 + 0.5) / 1e4
                    if est >= 0.5:
                        rows.append((vid, "near", oid, est))
        if kind != -1 and len(ids) > _HOT_BAND_WARN:
            logging.getLogger(__name__).warning(
                "hot LSH band key (band=%s key=%s): %d docs in state — "
                "per-trigger memory grows with this occupancy",
                kind,
                key[1],
                len(ids),
            )
        state.update((min_old, ids, sigs))
        yield pd.DataFrame(rows, columns=["doc_id", "tier", "dup_of", "est"])

    return keyed.groupBy("kind", "key").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def incremental_verdicts_from_matches(matches: DataFrame) -> DataFrame:
    """The downstream reducer: match rows -> the batch op's verdict
    table (doc_id, exact_dup_of, near_dup_of, verdict). Plain batch
    aggregation — run it over the sink table (per day in production,
    over the drained stream in tests)."""
    g = matches.groupBy("doc_id").agg(
        F.min(F.when(F.col("tier") == "exact", F.col("dup_of"))).alias("exact_dup_of"),
        F.min(F.when(F.col("tier") == "near", F.col("dup_of"))).alias("near_dup_of"),
    )
    return g.select(
        "doc_id",
        "exact_dup_of",
        "near_dup_of",
        F.when(F.col("exact_dup_of").isNotNull(), F.lit("exact_dup"))
        .when(F.col("near_dup_of").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
        .alias("verdict"),
    )
