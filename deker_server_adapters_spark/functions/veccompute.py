"""Arrow-vectorized embedding kernels (r17, guide §4.2).

The LSH signature emission and the per-candidate cosine rescore are
the two highest-volume expression paths in the similarity family. As
compiled Catalyst expressions they are correct but slow twice over:
the higher-order-function folds (``aggregate``/``zip_with``) evaluate
INTERPRETED (no whole-stage codegen), and the 24-table × 12-bit plane
set compiles to a ~100k-node expression tree that every consumer
branch re-instantiates — the r17 sweep measured the six ops built on
them at 17–130 s each at sf0.1 while no other registry op exceeded
11 s. Both paths are batch-parallel over rows with NO cross-row
state, i.e. exactly the shape guide §4.2 prescribes for
``mapInPandas`` + NumPy.

Bit-exactness contract (the reason these kernels may replace the
expressions at all): every float operation replays the JVM
expression's ops IN ORDER. The dot/norm folds are sequential
left-to-right multiply-adds — the kernels accumulate with an explicit
loop over dimensions (``acc += a[:, d] * b[:, d]``), vectorized
ACROSS rows but sequential across dims, which performs the identical
IEEE-754 double operations per element as the ``aggregate`` fold.
NEVER replace the loop with ``np.dot``/``@``/``einsum``: BLAS pairwise
or SIMD summation can differ in the last ulp, and the last ulp decides
sign bits and tie-safe rounding. The same convention is already load-
bearing in ``streaming/similarity_stream.py`` (its Python rescore
documents the identical rule) — these kernels extend it to the batch
side. Equality with the expression forms is pinned by
``tests/test_operators_semantics.py`` (exceptAll both ways == 0) and
by the unchanged oracle hashes of every consumer op.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def cos_scored(
    df: DataFrame,
    digits: int,
    a: str = "ea",
    b: str = "eb",
    out: str = "cos",
) -> DataFrame:
    """Replace columns ``a``/``b`` (array<float> embeddings) with the
    tie-safe ``digits``-dp cosine in ``out`` — the vectorized
    equivalent of ``round_ties_safe(cosine_similarity(a, b), digits)``.

    Every other column passes through unchanged; the embedding arrays
    are consumed inside the Arrow batch and never serialize back.
    Rounding replays ``round_ties_safe`` exactly: floor(x·10^d + 0.5)
    / 10^d in IEEE doubles (NaN stays NaN, matching the JVM floor)."""
    keep = [c for c in df.columns if c not in (a, b)]
    scale = float(10**digits)
    schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep
    ) + f", {out} double"

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            A = np.stack(pdf[a].to_numpy()).astype(np.float64)
            B = np.stack(pdf[b].to_numpy()).astype(np.float64)
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(A.shape[1]):  # sequential over dims: the fold
                x = A[:, d]
                y = B[:, d]
                dot += x * y
                na += x * x
                nb += y * y
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dot / (np.sqrt(na) * np.sqrt(nb))
                r = np.floor(cos * scale + 0.5) / scale
            o = pdf[keep].copy()
            o[out] = r
            yield o

    return df.mapInPandas(run, schema)


def signature_rows(
    df: DataFrame,
    planes: "list[list[float]]",
    tables: int,
    bits: int,
    max_probes: int,
    carry: "list[str]",
    emit_probes: bool,
) -> DataFrame:
    """(carry..., tbl, bucket[, is_probe]) — the vectorized LSH
    signature/probe emission shared by ``_hy_signatures``,
    ``_sh_signatures`` and ``_tj_signatures``.

    Input must hold ``embedding`` plus per-row ladder columns
    ``nbits``/``ntables``/``nprobes`` (constant-lit columns for the
    fixed-table threshold-join form) plus the ``carry`` columns.
    Per row and table t < ntables: bucket = Σ_{i<nbits} sign_bit_i·2^i
    with sign_bit_i = (dot(embedding, plane[t·bits+i]) > 0), the dot
    an explicit sequential fold (see module docstring); with
    ``emit_probes``, each live table additionally emits nprobes
    Hamming-adjacent buckets (home XOR 2^p, is_probe=1). Identical
    rows to the expression forms — only the evaluation engine moved."""
    PL = np.asarray(planes, dtype=np.float64)  # (tables·bits, dim)
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in carry
    ) + ", tbl int, bucket long" + (", is_probe int" if emit_probes else "")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            nbits = pdf["nbits"].to_numpy()
            ntables = pdf["ntables"].to_numpy()
            nprobes = pdf["nprobes"].to_numpy()
            dots = np.zeros((n, tables * bits))
            for d in range(E.shape[1]):  # sequential over dims: the fold
                dots += E[:, d, None] * PL[None, :, d]
            sbits = (dots > 0).astype(np.int64)
            idx_parts: list[np.ndarray] = []
            tbl_parts: list[np.ndarray] = []
            bkt_parts: list[np.ndarray] = []
            pr_parts: list[np.ndarray] = []
            rows = np.arange(n)
            for t in range(tables):
                sig = np.zeros(n, dtype=np.int64)
                for i in range(bits):
                    sig += np.where(i < nbits, sbits[:, t * bits + i] << i, 0)
                live = rows[t < ntables]
                idx_parts.append(live)
                tbl_parts.append(np.full(len(live), t, dtype=np.int64))
                bkt_parts.append(sig[live])
                pr_parts.append(np.zeros(len(live), dtype=np.int64))
                if emit_probes:
                    for p in range(max_probes):
                        plive = rows[(t < ntables) & (p < nprobes)]
                        idx_parts.append(plive)
                        tbl_parts.append(np.full(len(plive), t, dtype=np.int64))
                        bkt_parts.append(sig[plive] ^ (1 << p))
                        pr_parts.append(np.ones(len(plive), dtype=np.int64))
            idx = np.concatenate(idx_parts)
            o = pdf[carry].iloc[idx].reset_index(drop=True)
            o["tbl"] = np.concatenate(tbl_parts).astype(np.int32)
            o["bucket"] = np.concatenate(bkt_parts)
            if emit_probes:
                o["is_probe"] = np.concatenate(pr_parts).astype(np.int32)
            yield o

    return df.mapInPandas(run, out_schema)
