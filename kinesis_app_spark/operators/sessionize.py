"""Batch sessionization: gap-based session assignment + per-session rollup.

The streaming twin is ``session_window`` (see streaming/); this batch
version is the classic lag+cumsum construction:

    one shuffle on (user), sort by (ts, id) within partition,
    new_session = gap exceeded, session_idx = running sum of flags.

Both window passes share the same partitioning+ordering, so Catalyst plans
ONE Exchange + ONE Sort for the whole operator — check with .explain().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign a per-user session index (1-based, in time order)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    # microsecond-exact gap arithmetic (unix_timestamp would truncate to
    # seconds and disagree with the oracle at sub-second boundaries)
    gap_us = int(gap_minutes * 60_000_000)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(prev_ts.isNull(), F.lit(1)).when(
        F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregate: bounds, event count, value sum."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("value_sum"),
    )
