"""Hybrid-dedup recall/cost frontier past 10x (VERDICT r13 item 5).

The r13 tables ladder held hybrid pair recall at 0.744 on the 10x
corpus (nbits=6 -> ntables=16). The ladder's table count is capped at
``_HY_MAX_TABLES`` (24), which the bits ladder reaches at nbits=8
(n > 65,536 at the 512-occupancy target); past nbits=8 the cap binds
and each further bits step is no longer bought back with tables. This
harness MEASURES that frontier instead of extrapolating it: replicate
the sf embeddings KX (the stress.py key-shift scheme — identical
vectors under shifted vec_ids, the dedup workload's natural shape),
then report per K:

- the ladder point (n, nbits, ntables, sem-k),
- hybrid and cluster-only pair recall at tau against a brute-force
  truth pass, and
- the full ``dedup_semantic_hybrid`` wall-clock plus its per-row cost
  ratio vs the 1x base (sec_K / (K * sec_1) — the scaling-cliff read).

Truth sampling: a full n^2 truth pass at 80x is ~1.3e10 cosines — too
much box for a measurement harness. Instead the truth pass keeps only
pairs whose LOWER id lands in a deterministic hash sample
(pmod(xxhash64(vec_id), 1000) < permille). Every unordered pair has
exactly one lower id, the hash is uniform over ids, and whether a pair
is captured is a fixed property of the pair — so sampled recall is an
unbiased estimate of true pair recall, with ~1/sqrt(sampled-pairs)
relative error. permille=1000 reproduces the exact full-truth number
(the r13 protocol) at small K.

Usage:
    python -m deker_server_adapters_spark.tools.hybrid_frontier [K ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_FRONTIER_PERMILLE (default 50 = 5% of lower ids),
     SPARK_GRAFT_FRONTIER_RECALL=0 to skip the truth pass (cost-only
     timing runs — recall is run-invariant, wall-clock is not),
     SPARK_GRAFT_DRIVER_MEM (single local-mode heap; the 8g default
     GC-thrashes past ~60x — use 48g for frontier corpora),
     SPARK_GRAFT_FRONTIER_FORCE="b,t,p[;b,t,p...]" (r15): per K, ALSO
     measure recall + LSH candidate volume + candidate-generation wall
     at FORCED (nbits, ntables, nprobes) — the knob the r14 verdict's
     "nprobes=3 vs shard" question needs (nprobes up to the compiled
     _HY_MAX_PROBES=3; the production ladder still caps at 2).
Prints one JSON line per K; results recorded in docs/PERF.md (r14/r15).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deker_server_adapters_spark.functions.histogram import round_ties_safe
from deker_server_adapters_spark.functions.vectors import dot, l2_norm
from deker_server_adapters_spark.operators.similarity import (
    _SEM_TAU,
    _TJ_MAX_BITS,
    _TJ_MIN_BITS,
    _TJ_TARGET_BUCKET,
    _hy_tables_for_bits,
    _hybrid_cand_pairs,
    _sem_assignments,
    _sem_k,
    dedup_semantic_hybrid,
)
from deker_server_adapters_spark.sources.tables import load_table


def ladder_point(n: int) -> tuple[int, int]:
    """(nbits, ntables) the two ladders pick for an n-row corpus —
    the Python mirror of ``_tj_bits_ladder_sql`` / ``_hy_tables_ladder_sql``."""
    for b in range(_TJ_MIN_BITS, _TJ_MAX_BITS):
        if n <= _TJ_TARGET_BUCKET * (1 << b):
            return b, _hy_tables_for_bits(b)
    return _TJ_MAX_BITS, _hy_tables_for_bits(_TJ_MAX_BITS)


def write_scaled(spark: SparkSession, sf_dir: str, k: int, out_dir: str) -> str:
    """Replicate embeddings KX with the stress.py vec_id shift into
    ``out_dir`` (embeddings only — this harness touches no other
    table) and return the scaled sf_dir."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Replica shift must clear the observed id range or replicas collide
    # silently, corrupting every recall/cost number downstream (ADVICE
    # r14): derive the shift from max(vec_id), never assume < 10M.
    max_id = emb.agg(F.max("vec_id")).collect()[0][0] or 0
    shift = max(10_000_000, int(max_id) + 1)
    rep = spark.range(k).select(F.col("id").alias("__rep"))
    scaled = (
        emb.crossJoin(rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(shift))
        .drop("__rep")
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    # real map parallelism for the CPU-bound signature/assignment work
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def sampled_recall(
    spark: SparkSession, sf_dir: str, permille: int, nrow: "DataFrame | None" = None
) -> dict[str, float]:
    """Cluster-only and hybrid pair recall at ``_SEM_TAU``, truth pass
    restricted to pairs whose lower id is in the hash sample — the
    ``dedup_semantic_hybrid_recall`` measurement, sample-bounded.
    ``nrow`` (1-row nbits/ntables/nprobes DF) overrides the ladders —
    the forced-configuration probe the r15 frontier point uses."""
    emb = load_table(spark, sf_dir, "embeddings")
    asg = _sem_assignments(emb)
    a = emb.filter(F.expr(f"pmod(xxhash64(vec_id), 1000) < {permille}")).select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    cos = round_ties_safe(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
    )
    tp = (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= _SEM_TAU)
        .select("va", "vb")
    )
    ca = asg.select(F.col("vec_id").alias("va"), F.col("cell").alias("cell_a"))
    cb = asg.select(F.col("vec_id").alias("vb"), F.col("cell").alias("cell_b"))
    lp = _hybrid_cand_pairs(emb, asg, nrow=nrow).select(
        F.col("vid_b").alias("va"),
        F.col("vec_id").alias("vb"),
        F.lit(1).alias("cand_hit"),
    )
    row = (
        tp.join(ca, "va")
        .join(cb, "vb")
        .join(lp, ["va", "vb"], "left")
        .agg(
            F.count("*").alias("n_true_sampled"),
            F.sum(
                F.when(F.col("cell_a") == F.col("cell_b"), 1).otherwise(0)
            ).alias("n_cluster"),
            F.sum(
                F.when(
                    (F.col("cell_a") == F.col("cell_b")) | (F.col("cand_hit") == 1),
                    1,
                ).otherwise(0)
            ).alias("n_hybrid"),
        )
        .first()
    )
    n_true = row["n_true_sampled"] or 0
    return {
        "n_true_sampled": n_true,
        "recall_cluster": round(row["n_cluster"] / n_true, 4) if n_true else None,
        "recall_hybrid": round(row["n_hybrid"] / n_true, 4) if n_true else None,
    }


def op_wall(spark: SparkSession, sf_dir: str) -> float:
    t0 = time.perf_counter()
    dedup_semantic_hybrid(spark, sf_dir).count()
    return time.perf_counter() - t0


def sharded_point(
    spark: SparkSession,
    sf_dir: str,
    permille: int,
    include_unsharded: bool = True,
    lo_all: bool = False,
) -> dict:
    """One measurement of the SHARDED composition (r16): pair recall
    per stage, verdict recall, candidate volume, and the op wall —
    against the SAME sampled-truth protocol, except the truth sample
    keys on the HIGHER id (every unordered pair has exactly one, the
    hash is uniform, so pair-capture estimates stay unbiased AND the
    sampled should-drop set is exactly the sampled higher ids with
    some true lower mate — verdict recall needs the flagged side
    sampled, which the lower-id sample cannot give). The UNSHARDED op
    is measured under the identical vb-sample in the same JSON line,
    so the sharded-vs-ladder comparison never crosses protocols.

    ``include_unsharded=False`` (r17) skips every unsharded-machinery
    column — MANDATORY past the 262,144 ladder ceiling, where the
    unsharded op's pinned-at-nbits-9 buckets overflow the occupancy
    target and its candidate stream grows quadratically (the exact
    regime the sharded composition exists to escape); the sharded
    columns keep their definitions so frontier rows stay comparable
    to the gate rows."""
    from deker_server_adapters_spark.operators.similarity import (
        _hy_nrow,
        _sh_context,
        _sh_verdict,
        dedup_semantic_hybrid_sharded,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    # lo_all=True measures the r17 recall-recovery knob: survivor-pass
    # LO side opened to the full corpus (see _sh_context). The op wall
    # below still times the PRODUCTION op; cand/recall columns reflect
    # the knob, so a knob row pairs with its default row from the same
    # harness invocation.
    ctx = _sh_context(emb, lo_all=lo_all)
    if ctx is None:
        # empty embeddings table: mirror the op's own empty-corpus
        # handling with a clean zeroed report instead of a TypeError
        # on ctx['pairs_shard'] below (r17 ADVICE)
        return {
            "sharded": True,
            "permille_vb": permille,
            "n_true_sampled": 0,
            "recall_hybrid_vbsample": None,
            "recall_shard_pass": None,
            "recall_sharded": None,
            "n_should_drop_sampled": 0,
            "verdict_recall_sharded": None,
            "verdict_recall_unsharded": None,
            "n_cand_pairs_sharded": 0,
            "cand_sec_sharded": round(time.perf_counter() - t0, 2),
            "op_sec_sharded": 0.0,
        }
    n_cand_sharded = ctx["pairs_shard"].count() + ctx["pairs_new"].count()
    cand_sec = time.perf_counter() - t0
    b = emb.filter(F.expr(f"pmod(xxhash64(vec_id), 1000) < {permille}")).select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    a = emb.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    cos = round_ties_safe(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
    )
    tp = (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= _SEM_TAU)
        .select("va", "vb")
    )
    as_hit = lambda df, name: df.select(  # noqa: E731
        F.col("vid_b").alias("va"), F.col("vec_id").alias("vb"), F.lit(1).alias(name)
    )
    joined = tp.join(as_hit(ctx["pairs_shard"], "hit_sh"), ["va", "vb"], "left").join(
        as_hit(ctx["pairs_new"], "hit_nw"), ["va", "vb"], "left"
    )
    aggs = [
        F.count("*").alias("n_true_sampled"),
        F.sum(F.when(F.col("hit_sh") == 1, 1).otherwise(0)).alias("n_shard"),
        F.sum(
            F.when((F.col("hit_sh") == 1) | (F.col("hit_nw") == 1), 1).otherwise(0)
        ).alias("n_sharded"),
    ]
    if include_unsharded:
        # unsharded capture under the same vb-sample
        asg = _sem_assignments(emb)
        ca = asg.select(F.col("vec_id").alias("va"), F.col("cell").alias("cell_a"))
        cb = asg.select(F.col("vec_id").alias("vb"), F.col("cell").alias("cell_b"))
        lp = as_hit(_hybrid_cand_pairs(emb, asg, nrow=_hy_nrow(emb)), "hit_hy")
        joined = (
            joined.join(ca, "va").join(cb, "vb").join(lp, ["va", "vb"], "left")
        )
        aggs.append(
            F.sum(
                F.when(
                    (F.col("cell_a") == F.col("cell_b")) | (F.col("hit_hy") == 1), 1
                ).otherwise(0)
            ).alias("n_hybrid")
        )
    row = joined.agg(*aggs).first()
    # verdict recall over the sampled should-drop set (higher ids with
    # some true lower mate), both forms
    sd = tp.select(F.col("vb").alias("vec_id")).distinct()
    fl_sh = sd.join(
        _sh_verdict(ctx).select("vec_id", F.col("is_dup").alias("d_sh")),
        "vec_id",
        "left",
    )
    v_sh = fl_sh.agg(
        F.count("*").alias("n_sd"),
        F.sum(F.when(F.col("d_sh"), 1).otherwise(0)).alias("n_fl"),
    ).first()
    v_hy = None
    if include_unsharded:
        fl_hy = sd.join(
            dedup_semantic_hybrid(spark, sf_dir).select(
                "vec_id", F.col("is_dup").alias("d_hy")
            ),
            "vec_id",
            "left",
        )
        v_hy = fl_hy.agg(
            F.count("*").alias("n_sd"),
            F.sum(F.when(F.col("d_hy"), 1).otherwise(0)).alias("n_fl"),
        ).first()
    t0 = time.perf_counter()
    dedup_semantic_hybrid_sharded(spark, sf_dir).count()
    op_sec = time.perf_counter() - t0
    nt = row["n_true_sampled"] or 0
    nsd = v_sh["n_sd"] or 0
    r4 = lambda x, d: round(x / d, 4) if d else None  # noqa: E731
    return {
        "sharded": True,
        "lo_all": lo_all,
        "permille_vb": permille,
        "n_true_sampled": nt,
        "recall_hybrid_vbsample": (
            r4(row["n_hybrid"], nt) if include_unsharded else None
        ),
        "recall_shard_pass": r4(row["n_shard"], nt),
        "recall_sharded": r4(row["n_sharded"], nt),
        "n_should_drop_sampled": nsd,
        "verdict_recall_sharded": r4(v_sh["n_fl"], nsd),
        "verdict_recall_unsharded": (
            r4(v_hy["n_fl"], nsd) if include_unsharded else None
        ),
        "n_cand_pairs_sharded": n_cand_sharded,
        "cand_sec_sharded": round(cand_sec, 2),
        "op_sec_sharded": round(op_sec, 2),
    }


def main() -> None:
    from deker_server_adapters_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    permille = int(os.environ.get("SPARK_GRAFT_FRONTIER_PERMILLE", "50"))
    ks = [int(x) for x in sys.argv[1:]] or [10, 30, 80]

    spark = get_spark(app_name="hybrid-frontier", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # r17 direct-dir mode: measure ONLY the sharded composition on an
    # existing corpus dir (e.g. a tools/gen_testdata fresh-draw corpus
    # past the 262,144 ceiling) — no replication, no unsharded
    # machinery (whose pinned ladder explodes past the ceiling).
    lo_all = os.environ.get("SPARK_GRAFT_SHARDED_LO_ALL", "0") == "1"
    direct = os.environ.get("SPARK_GRAFT_FRONTIER_DIR")
    if direct:
        n = load_table(spark, direct, "embeddings").count()
        out = {
            "dir": direct,
            "n": n,
            **sharded_point(
                spark, direct, permille, include_unsharded=False, lo_all=lo_all
            ),
        }
        sys.stdout.write(json.dumps(out) + "\n")
        return

    base_sec = min(op_wall(spark, sf_dir) for _ in range(2))
    n_base = load_table(spark, sf_dir, "embeddings").count()

    for k in ks:
        tmp = tempfile.mkdtemp(prefix=f"hybrid_frontier_{k}x_")
        try:
            scaled_dir = write_scaled(spark, sf_dir, k, tmp)
            n = n_base * k
            nbits, ntables = ladder_point(n)
            if os.environ.get("SPARK_GRAFT_FRONTIER_RECALL", "1") != "0":
                rec = sampled_recall(spark, scaled_dir, permille)
            else:
                rec = {}
            sec = op_wall(spark, scaled_dir)
            out = {
                "k": k,
                "n": n,
                "nbits": nbits,
                "ntables": ntables,
                "sem_k": _sem_k(n),
                "permille": permille,
                **rec,
                "op_sec": round(sec, 2),
                "base_sec": round(base_sec, 2),
                "cost_ratio_per_row": round(sec / (k * base_sec), 2),
            }
            sys.stdout.write(json.dumps(out) + "\n")
            sys.stdout.flush()
            # r16: the sharded composition at the same K (one line,
            # same box/session — directly comparable to the ladder row)
            if os.environ.get("SPARK_GRAFT_FRONTIER_SHARDED", "0") == "1":
                sout = {
                    "k": k,
                    **sharded_point(spark, scaled_dir, permille, lo_all=lo_all),
                }
                sys.stdout.write(json.dumps(sout) + "\n")
                sys.stdout.flush()
            # r15: forced-configuration points (nprobes=3 vs shard)
            for spec in filter(
                None, os.environ.get("SPARK_GRAFT_FRONTIER_FORCE", "").split(";")
            ):
                fb, ft, fp = (int(x) for x in spec.split(","))
                nrow = spark.createDataFrame(
                    [(fb, ft, fp)], "nbits int, ntables int, nprobes int"
                )
                emb = load_table(spark, scaled_dir, "embeddings")
                asg = _sem_assignments(emb)
                t0 = time.perf_counter()
                n_cand = _hybrid_cand_pairs(emb, asg, nrow=nrow).count()
                cand_sec = time.perf_counter() - t0
                frec = sampled_recall(spark, scaled_dir, permille, nrow=nrow)
                fout = {
                    "k": k,
                    "forced": {"nbits": fb, "ntables": ft, "nprobes": fp},
                    "n_cand_pairs": n_cand,
                    "cand_sec": round(cand_sec, 2),
                    **frec,
                }
                sys.stdout.write(json.dumps(fout) + "\n")
                sys.stdout.flush()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
