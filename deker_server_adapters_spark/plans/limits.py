"""Resource budget guards — the engine-side analogue of the
reference's rate/data-points limits (httpx_client.py:52-60): a server
refuses oversized subsets with 413 + RateLimit headers; here a plan
whose estimated output exceeds the budget is refused before execution.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

from deker_server_adapters_spark.core.errors import DekerDataPointsLimitError, DekerSparkError


class DekerTimeoutError(DekerSparkError):
    """Parity with the reference's DekerTimeoutServer (504 handling,
    base.py:252-263): the engine-side analogue cancels the job group
    when an action exceeds its budget."""


def run_with_timeout(df: DataFrame, seconds: float, action: str = "count"):
    """Run a DataFrame action under a wall-clock budget; on timeout the
    job group is cancelled cluster-wide and DekerTimeoutError raised.
    (Spark's cancellation is cooperative per task — the guard rail for
    runaway queries, not a precise timer.)"""
    spark = df.sparkSession
    sc = spark.sparkContext
    group = f"deker-timeout-{id(df)}"
    sc.setJobGroup(group, f"budgeted {action}", interruptOnCancel=True)
    timed_out = threading.Event()

    def _cancel() -> None:
        # Flag first: the exception raised by the cancelled action may be
        # any Py4J/Spark error class and carry any message — the flag, not
        # the message text, is what classifies it as a timeout.
        timed_out.set()
        sc.cancelJobGroup(group)

    timer = threading.Timer(seconds, _cancel)
    timer.start()
    try:
        return getattr(df, action)()
    except Exception:
        if timed_out.is_set():
            raise DekerTimeoutError(f"Timeout on {action} after {seconds}s") from None
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "")


def estimated_rows(df: DataFrame) -> int | None:
    """Catalyst's row-count estimate for the optimized plan (None if
    the optimizer has no estimate)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    row_count = stats.rowCount()
    if row_count.isDefined():
        return int(row_count.get().toString())
    return None


def estimated_bytes(df: DataFrame) -> int:
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def enforce_budget(
    df: DataFrame,
    max_rows: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Refuse plans whose estimated output exceeds the budget.

    Uses optimizer statistics only — no job is run. Returns the df
    unchanged when within budget so it chains fluently.
    """
    if max_bytes is not None:
        got = estimated_bytes(df)
        if got > max_bytes:
            raise DekerDataPointsLimitError(
                "Requested object is too large, use smaller subset",
                limit=max_bytes,
                requested=got,
            )
    if max_rows is not None:
        est = estimated_rows(df)
        if est is not None and est > max_rows:
            raise DekerDataPointsLimitError(
                "Requested object is too large, use smaller subset",
                limit=max_rows,
                requested=est,
            )
    return df
