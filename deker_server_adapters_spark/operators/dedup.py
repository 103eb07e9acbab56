"""Deduplication operators over ``documents`` / ``embeddings``.

Five families, each the standard large-corpus technique:

- exact:          hash-groupBy on normalized text (one shuffle).
- n-gram Jaccard: shingle inverted index self-join; a document-frequency
                  ceiling on shingles bounds the pair blowup (the same
                  role LSH banding plays) so the join never goes
                  quadratic in corpus size.
- MinHash + LSH:  K seeded min-hashes → bands → bucket join → verify on
                  signature agreement. Only bucket-mates are paired.
- SimHash:        16-bit sign-of-weighted-sum sketch; near-dups =
                  small Hamming distance (bit_count of xor).
- embedding:      cosine >= threshold pairs; brute force here (the
                  oracle-checkable baseline), LSH-bucketed variant in
                  ``similarity.py`` is the 100 TB path.

All hashing is the portable md5-prefix (``functions/hashing.py``) so
DuckDB verifies bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deker_server_adapters_spark.operators import Op
from deker_server_adapters_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
_NORM_DUCK = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS = f"split({_NORM}, ' ')"
_TOKENS_DUCK = f"string_split({_NORM_DUCK}, ' ')"

# word 5-gram shingles
_SHINGLE_N = 5
_SHINGLES = (
    f"transform(sequence(1, greatest(size({_TOKENS}) - {_SHINGLE_N - 1}, 1)), "
    f"i -> array_join(slice({_TOKENS}, i, {_SHINGLE_N}), ' '))"
)
_SHINGLES_DUCK = (
    f"list_transform(range(1, greatest(len({_TOKENS_DUCK}) - {_SHINGLE_N - 1}, 1) + 1), "
    f"i -> array_to_string({_TOKENS_DUCK}[i:i+{_SHINGLE_N - 1}], ' '))"
)

_DF_CEILING = 200  # drop shingles present in more docs than this (stopword shingles)
_MINHASH_K = 12
_BAND_SIZE = 2

# MinHash permutations: one md5 per shingle, then K affine maps
# (a_k*h + b_k) mod P (Carter-Wegman). 12x less hashing than seeded
# md5 per permutation, and small enough to stay in one codegen unit.
# a_k*h < 2^21 * 2^32 < 2^53 — no BIGINT overflow in either engine.
_MH_P = 2147483647
_MH_A = [769, 1543, 3079, 6151, 12289, 24593, 49157, 98317, 196613, 393241, 786433, 1572869]
_MH_B = [7, 131, 523, 2053, 8209, 32771, 131101, 524309, 2097169, 8388617, 33554467, 134217757]


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(f"md5({_NORM})").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
    )


EXACT_SQL = f"""
SELECT md5({_NORM_DUCK}) AS text_hash,
       count(*) AS n_dups, min(doc_id) AS canonical_doc_id
FROM documents
GROUP BY text_hash
"""


def _shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tokens materialized first — inlining the split chain inside the
    # shingle lambda re-splits the text per element (O(n^2), see
    # minhash_signatures)
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t"))
    return (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(t) - {_SHINGLE_N - 1}, 1)), "
                    f"i -> array_join(slice(t, i, {_SHINGLE_N}), ' '))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs with word-5-gram Jaccard >= 0.5."""
    sh = _shingle_table(spark, sf_dir)
    # document-frequency ceiling: ubiquitous shingles carry no signal and
    # explode the join — same pruning a production pipeline applies.
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _DF_CEILING)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


NGRAM_JACCARD_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
), rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {_DF_CEILING}
), shr AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM shr GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, n_common,
       round(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE), 4) >= 0.5
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature table: (doc_id, sig: array<long> of length K).

    One map-only pass, zero shuffles, fully whole-stage-codegen:
    hash every shingle under all K seeds in ONE ``transform`` (so the
    expensive split/regexp shingle chain is evaluated once per row —
    inlining it per seed measured 150x slower), then take the K
    column-mins. (min over the shingle *array* equals min over the
    distinct shingle *set*.) At 100 TB this is the difference between
    a map-only stage and an exploded 12x shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Materialize tokens, then shingles, then base hashes as separate
    # projections: inlining the split/regexp chain inside the shingle
    # lambda makes Catalyst re-split the text per element (O(n^2)).
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t"))
    sh = toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(size(t) - {_SHINGLE_N - 1}, 1)), "
            f"i -> array_join(slice(t, i, {_SHINGLE_N}), ' '))"
        ).alias("shingles"),
    )
    hv = sh.select(
        "doc_id",
        F.expr(
            "transform(shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT))"
        ).alias("hv"),
    )
    mins = ", ".join(
        f"array_min(transform(hv, h -> ({_MH_A[k]} * h + {_MH_B[k]}) % {_MH_P}))"
        for k in range(_MINHASH_K)
    )
    return hv.select("doc_id", F.expr(f"array({mins})").alias("sig"))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(K=12)/LSH(band=2) near-dup pairs with signature-agreement
    estimate >= 0.5.

    Candidate pairs come only from shared LSH buckets, and the full
    signature array rides through the band join, so the estimate is a
    per-row ``zip_with`` — no second join back to the signature table.
    """
    # persist: the signature table is read three times (band self-join
    # sides + verify); on a cluster you'd cache this exactly the same way.
    sigs = minhash_signatures(spark, sf_dir).persist()
    n_bands = _MINHASH_K // _BAND_SIZE
    stack_args = ", ".join(
        f"{b}, concat_ws(',', "
        + ", ".join(f"sig[{b * _BAND_SIZE + i}]" for i in range(_BAND_SIZE))
        + ")"
        for b in range(n_bands)
    )
    bands = sigs.select(
        "doc_id", F.expr(f"stack({n_bands}, {stack_args}) AS (band, band_key)")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.expr(
        "CAST(round(aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        f"0, (acc, v) -> acc + v) / {float(_MINHASH_K)}, 4) AS DOUBLE)"
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
    )


_MH_SEEDS_VALUES = ", ".join(
    f"({k}, {_MH_A[k]}, {_MH_B[k]})" for k in range(_MINHASH_K)
)

MINHASH_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
), hv AS (
  SELECT doc_id, CAST(CAST('0x' || substr(md5(shingle), 1, 8) AS UBIGINT) AS BIGINT) AS h
  FROM sh
), seeds(seed, a, b) AS (
  VALUES {_MH_SEEDS_VALUES}
), sigs AS (
  SELECT doc_id, CAST(seed AS INT) AS seed, min((a * h + b) % {_MH_P}) AS minh
  FROM hv, seeds
  GROUP BY doc_id, seed
), bands AS (
  SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM sigs GROUP BY doc_id, band
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(sum(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) / {float(_MINHASH_K)}, 4) AS est_jaccard
FROM cand
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b AND sb.seed = sa.seed
GROUP BY doc_a, doc_b
HAVING round(sum(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) / {float(_MINHASH_K)}, 4) >= 0.5
"""


_SIMHASH_BITS = 16


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash near-dup pairs (Hamming distance <= 3)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("tok")).distinct()
    bits = spark.range(_SIMHASH_BITS).select(F.col("id").cast("int").alias("bit"))
    contrib = toks.crossJoin(F.broadcast(bits)).select(
        "doc_id",
        "bit",
        F.expr(
            "CASE WHEN (CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT) >> bit) % 2 = 1 "
            "THEN 1 ELSE -1 END"
        ).alias("c"),
    )
    simhash = (
        contrib.groupBy("doc_id", "bit")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(1L, bit) ELSE 0L END")).alias("simhash"))
    )
    a = simhash.alias("a")
    b = simhash.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= 3)
    )


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents
), contrib AS (
  SELECT doc_id, CAST(bit AS INT) AS bit,
         CASE WHEN (CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT) >> CAST(bit AS INT)) % 2 = 1
              THEN 1 ELSE -1 END AS c
  FROM toks, range({_SIMHASH_BITS}) r(bit)
), sums AS (
  SELECT doc_id, bit, sum(c) AS s FROM contrib GROUP BY doc_id, bit
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash
  FROM sums GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.95 (brute-force baseline;
    ``ann_lsh_cosine`` is the bucketed scale path)."""
    from deker_server_adapters_spark.functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    # precompute each vector's norm once per ROW (not per pair — the
    # inline cosine recomputes both norms for all O(n^2) pairs);
    # values are bit-identical since the norm is the same fold over
    # the same array either way.
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= 0.95)
        .select("vec_a", "vec_b", "cosine")
    )


EMBED_DEDUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.95
"""


def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup on normalized-text prefixes, with pair
    generation bounded by blocking keys (source + length bucket) —
    the classic blocking+distance pattern; unblocked pairwise
    levenshtein is quadratic and never acceptable at scale."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.col("source").alias("src"),
        F.expr("CAST(n_chars DIV 100 AS INT)").alias("len_bucket"),
        F.expr(f"substr({_NORM}, 1, 24)").alias("prefix"),
    )
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("lev"),
        )
        .filter(F.col("lev") <= 8)
    )


LEVENSHTEIN_SQL = f"""
WITH base AS (
  SELECT doc_id, source AS src, CAST(n_chars // 100 AS INT) AS len_bucket,
         substr({_NORM_DUCK}, 1, 24) AS prefix
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS INT) AS lev
FROM base a JOIN base b
  ON a.src = b.src AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 8
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clustering: connected components over the
    minhash near-dup pairs, canonical id = component minimum.

    Iterative min-label propagation (driver loops over *stages*, data
    never leaves the cluster): each round every node takes the min of
    its own label and its neighbors' labels; converges in O(component
    diameter) rounds. The oracle computes the same fixpoint as a
    recursive-CTE transitive closure.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    fwd = pairs
    rev = pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    edges = fwd.unionByName(rev).persist()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    for _ in range(20):  # diameter bound; tiny components converge fast
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("canonical_id"))


COMPONENTS_SQL = f"""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
), hv AS (
  SELECT doc_id, CAST(CAST('0x' || substr(md5(shingle), 1, 8) AS UBIGINT) AS BIGINT) AS h
  FROM sh
), seeds(seed, a, b) AS (
  VALUES {_MH_SEEDS_VALUES}
), sigs AS (
  SELECT doc_id, CAST(seed AS INT) AS seed, min((a * h + b) % {_MH_P}) AS minh
  FROM hv, seeds
  GROUP BY doc_id, seed
), bands AS (
  SELECT doc_id, CAST(seed // {_BAND_SIZE} AS INT) AS band,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM sigs GROUP BY doc_id, band
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), pairs AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN sigs sa ON sa.doc_id = doc_a
  JOIN sigs sb ON sb.doc_id = doc_b AND sb.seed = sa.seed
  GROUP BY doc_a, doc_b
  HAVING round(sum(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) / {float(_MINHASH_K)}, 4) >= 0.5
), edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT doc_a AS src, doc_a AS dst FROM edges
  UNION
  SELECT r.src, e.doc_b AS dst
  FROM reach r JOIN edges e ON r.dst = e.doc_a
)
SELECT src AS doc_id, min(dst) AS canonical_id
FROM reach
GROUP BY src
"""


OPS = {
    "dedup_exact": Op("dedup_exact", dedup_exact, EXACT_SQL),
    "dedup_components": Op("dedup_components", dedup_components, COMPONENTS_SQL),
    "dedup_levenshtein": Op("dedup_levenshtein", dedup_levenshtein, LEVENSHTEIN_SQL),
    "dedup_ngram_jaccard": Op("dedup_ngram_jaccard", dedup_ngram_jaccard, NGRAM_JACCARD_SQL),
    "dedup_minhash_lsh": Op("dedup_minhash_lsh", dedup_minhash_lsh, MINHASH_SQL, headline=True),
    "dedup_simhash": Op("dedup_simhash", dedup_simhash, SIMHASH_SQL),
    "dedup_embedding": Op("dedup_embedding", dedup_embedding, EMBED_DEDUP_SQL),
}
