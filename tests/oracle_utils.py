"""Local replica of the driver's DuckDB-oracle correctness check:
row count + schema (column names) + order-insensitive value hash."""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Driver-faithful (r10): NO float rounding here. The driver hashes
    # values exactly, so the local gate must too — the r9 red row
    # (nation_order_value_quantiles, a 6th-decimal divergence of an
    # already-rounded column) sailed through the old round-to-9dp +
    # rtol=1e-9 compare and failed the driver. Floats are only
    # dtype-widened to float64 (the carrier both engines arrive in).
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
            isinstance(v, int) for v in df[c].dropna().head(5)
        ):
            try:
                df[c] = df[c].astype("int64")
            except (ValueError, TypeError, OverflowError):
                pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if len(sp) != len(duck_df):
        return False, f"row count {len(sp)} vs {len(duck_df)}"
    if sorted(sp.columns) != sorted(duck_df.columns):
        return False, f"schema {sorted(sp.columns)} vs {sorted(duck_df.columns)}"
    # Type-kind gate, mirroring a type-sensitive driver hash: an
    # integer column on one side arriving float on the other is the
    # DuckDB HUGEINT→pandas-float64 leak (sum over BIGINT); it passed
    # the lenient check_dtype=False compare below but failed the r5
    # driver hash for docs_pack_sequences. Decimal/object columns stay
    # exempt — both engines legitimately disagree on their carrier.
    for c in sp.columns:
        a_int = pd.api.types.is_integer_dtype(sp[c])
        b_int = pd.api.types.is_integer_dtype(duck_df[c])
        a_flt = pd.api.types.is_float_dtype(sp[c])
        b_flt = pd.api.types.is_float_dtype(duck_df[c])
        if (a_int and b_flt) or (a_flt and b_int):
            return False, (
                f"column {c}: int-vs-float dtype kind (spark {sp[c].dtype} "
                f"vs oracle {duck_df[c].dtype}) — likely un-CAST DuckDB "
                f"HUGEINT sum; add CAST(... AS BIGINT) in the oracle SQL"
            )
    a, b = _normalize(sp), _normalize(duck_df)
    try:
        # Exact compare — the pass criterion, faithful to the driver's
        # value hash. NaN==NaN is allowed (pandas treats them equal),
        # matching a hash over a stable NULL/NaN encoding.
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        # Diagnostic second pass only: say whether the divergence is
        # precision-scale (would have passed the old lenient gate) so
        # the failure message points at rounding-convention bugs.
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
            )
            hint = " [within rtol=1e-9: precision/rounding-convention divergence]"
        except AssertionError:
            hint = ""
        return False, str(e)[:800] + hint
    return True, "ok"
