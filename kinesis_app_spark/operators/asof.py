"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, attach the single most recent right row with
the same key and ``right_ts <= left_ts`` (backward inclusive; the standard
financial/CDC "last known value" join, same semantics as DuckDB ASOF JOIN
and pandas merge_asof).

Implementation is the union+window trick, chosen for scale:

    union(left tagged 1, right tagged 0)
      -> single shuffle on (key), sort within partition by (ts, tag, seq)
      -> last_value(right cols, ignoreNulls) over rows-preceding window
      -> keep tagged-left rows

One shuffle, no join explosion, no per-key driver loop. The naive
alternative (theta join right.ts <= left.ts + top-1) is O(|L|x|R|) per key;
this is O((|L|+|R|) log) via sort — the plan you want when both sides are
100 TB-scale. Skewed keys are handled by AQE skew-split since the shuffle
is a plain hash partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join; right columns come back null when no right row matches.

    direction="backward" (default): most recent right row with
    right_ts <= left_ts — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``.
    direction="forward": earliest right row with right_ts >= left_ts —
    DuckDB ``ASOF JOIN ... ON l.ts <= r.ts``.
    tolerance: an INTERVAL string (e.g. "30 minutes"); matches farther than
    this from the left timestamp are nulled out, pandas-merge_asof style.

    Forward is the same one-shuffle union+window plan with the sort
    reversed; tolerance is a post-window null-out (the matched right ts is
    carried through the window alongside the values), so neither option
    adds a shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__match_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys and c != left_ts
        ],
        F.col(right_ts).alias("__match_rts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )

    unioned = lhs.unionByName(rhs)
    # Right rows sort before left rows at equal ts => inclusive match.
    # Backward scans time ascending (last right at-or-before); forward
    # scans descending (so "last" = earliest right at-or-after).
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("__match_rts"), ignorenulls=True).over(w).alias("__f_match_rts"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    if tolerance is not None:
        delta = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            F.col("__f_match_rts") >= F.col("__ts") - delta
            if direction == "backward"
            else F.col("__f_match_rts") <= F.col("__ts") + delta
        )
        filled = filled.select(
            *[c for c in filled.columns if not c.startswith("__f_")],
            *[
                F.when(in_tol, F.col(f"__f_{c}")).alias(f"__f_{c}")
                for c in value_cols
            ],
        )
    out = filled.filter(F.col("__is_left") == 1).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[c for c in left.columns if c not in keys and c != left_ts],
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )
    return out
