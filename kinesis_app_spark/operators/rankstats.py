"""Distributed exact order statistics — value-at-rank without a global sort.

The scale primitive behind exact quantiles, equi-depth histogram
boundaries, and quartile cuts: given a numeric column and a set of
0-based ascending ranks, return the exact value at each rank using only

- bounded driver collects (1-row count/min/max, ≤``buckets``-row
  histograms), and
- a final ``orderBy().limit()`` probe over at most ``probe_bound`` rows
  (TakeOrderedAndProject, never a sort of n).

Skew safety (round-2 verdict task #6): when the bucket holding a target
rank exceeds ``probe_bound`` (a pathological value occupying ≫ n/buckets
of the data), the bucket is RE-HISTOGRAMMED over its own [min, max]
range instead of sorted — recursion narrows the range until either the
bucket fits the probe bound or the range degenerates to a single value
(min == max), which is returned directly with no sort at all. A heavy
repeated value therefore costs extra *scan+aggregate* passes (codegen,
partial-aggregable), never a large sort.

Reference parity: the reference (Soostone/kinesis-app) is a stream-
coordination framework with no quantile machinery; this primitive exists
for the engine surface mandated by the north star (BASELINE.json) and
follows the two-pass histogram method of Greenwald-Khanna-era exact
selection (see PAPERS.md: M. Blum et al. selection bounds; the
distributed adaptation is the standard bucket-walk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1024
MAX_DEPTH = 16  # 1024^16 range subdivisions — depth exhaustion means a
# adversarial float distribution; the final probe still bounds the sort
# by the last bucket's count, it just may exceed probe_bound


def values_at_ranks(
    df: DataFrame,
    col: str,
    ranks: list[int],
    *,
    buckets: int = DEFAULT_BUCKETS,
    probe_bound: int | None = None,
    stats: dict | None = None,
) -> dict[int, float]:
    """Exact value at each 0-based ascending rank of ``df[col]``.

    ``probe_bound``: max rows the final probe may sort; defaults to
    ``max(8 * n / buckets, 4096)`` — 8× the even-split bucket size.
    ``stats``: optional dict; records ``max_probe_rows`` (largest sort
    actually performed) and ``histogram_passes`` for tests.
    """
    x = df.select(F.col(col).cast("double").alias("x"))
    n, mn, mx = x.agg(F.count("x"), F.min("x"), F.max("x")).collect()[0]
    if stats is not None:
        stats.setdefault("histogram_passes", 0)
        stats.setdefault("max_probe_rows", 0)
    if n == 0:
        return {}
    bound = probe_bound if probe_bound is not None else max(
        (8 * n) // buckets, 4096
    )
    out: dict[int, float] = {}
    for rank in sorted(set(ranks)):
        if not 0 <= rank < n:
            raise ValueError(f"rank {rank} outside [0, {n})")
        out[rank] = _value_at_rank(
            x, rank, n, mn, mx, buckets, bound, stats, depth=0
        )
    return out


def _bucket_expr(mn: float, width: float, buckets: int):
    return F.least(
        F.floor((F.col("x") - F.lit(mn)) / F.lit(width)),
        F.lit(buckets - 1),
    ).cast("int")


def _value_at_rank(
    x: DataFrame,
    rank: int,
    n: int,
    mn: float,
    mx: float,
    buckets: int,
    bound: int,
    stats: dict | None,
    depth: int,
) -> float:
    """Recursive bucket walk: narrow [mn, mx] until the target bucket
    fits ``bound`` rows (probe) or is a single repeated value (return)."""
    if mn == mx:
        # every row in range equals mn: rank irrelevant, no sort needed —
        # this is the terminal case for the heavy-value recursion
        return mn
    width = (mx - mn) / buckets
    bexpr = _bucket_expr(mn, width, buckets)
    if stats is not None:
        stats["histogram_passes"] += 1
    hist = {
        r["b"]: r["c"]
        for r in x.groupBy(bexpr.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    cum = 0
    for b in range(buckets):
        c = hist.get(b, 0)
        if cum + c > rank:
            break
        cum += c
    else:  # pragma: no cover — rank < n guarantees the walk lands
        raise AssertionError("rank walk fell off the histogram")
    offset = rank - cum
    lo = mn + b * width
    hi = mn + (b + 2) * width  # one-bucket slack: range filter is for
    # parquet pushdown only; the exact bucket expression is the filter
    sub = x.filter(
        (F.col("x") >= lo - width) & (F.col("x") <= hi)
    ).filter(bexpr == b)
    if c > bound and depth < MAX_DEPTH:
        # skew: this bucket is ≫ its even share — re-histogram inside it
        # over its OWN min/max (the parent's arithmetic bounds may be
        # loose after float rounding)
        smn, smx = sub.agg(F.min("x"), F.max("x")).collect()[0]
        return _value_at_rank(
            sub, offset, c, smn, smx, buckets, bound, stats, depth + 1
        )
    if stats is not None:
        stats["max_probe_rows"] = max(stats["max_probe_rows"], c)
    row = (
        sub.orderBy("x")
        .limit(offset + 1)
        .agg(F.max("x").alias("v"))
        .collect()[0]
    )
    return row["v"]
