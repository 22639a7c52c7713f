"""Time-series regularization: per-key daily resampling with gap fill.

The training-pipeline shape: event streams are irregular, models want
dense per-entity series. For each key, generate its full day range
(min..max activity day), left-join the actual daily aggregates, and fill
gaps with zero.

Scale: the day scaffold is built per key with sequence+explode — a per-row
map (no shuffle) whose output is |keys| x |days|; the only shuffle is the
daily aggregation itself, keyed by (key, day). No driver-side calendar, no
cross join against a global date dimension (which would fan out to keys x
all-days instead of keys x own-days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_daily(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
) -> DataFrame:
    """(key, day, n_events, value_sum) for EVERY day in each key's
    [first activity day, last activity day] range — missing days present
    with zeros."""
    daily = (
        df.groupBy(
            F.col(key), F.date_trunc("day", F.col(ts)).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 2).alias("value_sum"),
        )
    )
    scaffold = (
        daily.groupBy(key)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key,
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return (
        scaffold.join(daily, [key, "day"], "left")
        .select(
            key,
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        )
    )
