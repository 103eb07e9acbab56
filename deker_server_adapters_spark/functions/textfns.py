"""Text primitives for the dedup / text-analysis operators.

All pure Catalyst expressions. Normalization is lower + whitespace
collapse so shingle sets are insensitive to trivial formatting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def word_tokens(col: Column) -> Column:
    """array<string> of whitespace-delimited tokens of normalized text."""
    return F.split(normalize_text(col), " ")


def char_shingles(col: Column, k: int = 8) -> Column:
    """array<string> of overlapping character k-grams of normalized text.

    Expressed as ``transform(sequence(...), i -> substring(text, i, k))``
    — stays in codegen, no explode needed until the caller wants one.
    """
    norm = normalize_text(col)
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))


def _char_shingles_expr(text_expr: str, k: int = 8) -> str:
    """Spark SQL string form (substring with dynamic start needs expr)."""
    norm = f"trim(regexp_replace(lower({text_expr}), '\\\\s+', ' '))"
    return (
        f"transform(sequence(1, greatest(length({norm}) - {k - 1}, 1)), "
        f"i -> substr({norm}, i, {k}))"
    )


def char_shingles_col(col_name: str, k: int = 8) -> Column:
    return F.expr(_char_shingles_expr(col_name, k))


def word_shingles_col(col_name: str, n: int = 3) -> Column:
    """array<string> of word n-grams (space-joined) of normalized text."""
    norm = f"split(trim(regexp_replace(lower({col_name}), '\\\\s+', ' ')), ' ')"
    return F.expr(
        f"transform(sequence(1, greatest(size({norm}) - {n - 1}, 1)), "
        f"i -> array_join(slice({norm}, i, {n}), ' '))"
    )
