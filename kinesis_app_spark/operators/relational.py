"""Relational operator surface — thin, typed wrappers over DataFrame ops.

Deliberately thin: the point (SURVEY.md §2.2, §4) is to *declare* plans and
let Catalyst pick physical strategies (broadcast-hash vs sort-merge joins,
partial+final aggregation, TakeOrderedAndProject for top-k). Custom code
only exists where Spark lacks the operator (see asof.py, dedup.py,
similarity.py).

Scale notes are attached per operator where the 100 TB behavior is
non-obvious.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------- projection / filter ----------

def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    return df.select(*cols)


def filter_(df: DataFrame, predicate: Column | str) -> DataFrame:
    return df.filter(predicate)


# ---------- joins ----------

def equi_join(
    df: DataFrame, other: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Catalyst picks BHJ/SMJ/SHJ; AQE can demote SMJ->BHJ at runtime."""
    return df.join(other, on, how)


def broadcast_join(
    df: DataFrame, small: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Explicit broadcast hint — zero shuffle on the big side. Use for any
    dimension that fits in executor memory (region/nation/supplier here;
    rule of thumb < ~1 GiB serialized on a real cluster)."""
    return df.join(F.broadcast(small), on, how)


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS — never multiplies rows, cheaper than join+distinct."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return df.join(other, on, "left_anti")


def theta_join(df: DataFrame, other: DataFrame, condition: Column) -> DataFrame:
    """Arbitrary-predicate join -> BroadcastNestedLoop. Only sane when one
    side is broadcastable; for pure range predicates prefer range_join()."""
    return df.join(other, condition)


def range_join(
    df: DataFrame,
    other: DataFrame,
    lower: Column,
    upper: Column,
    equi_on: Column | None = None,
) -> DataFrame:
    """Range/band join. With an equi component Catalyst plans a hash join
    with the range as post-filter (shuffles only on the equi keys); without
    one, broadcast the small side to avoid a cartesian shuffle."""
    cond = lower & upper
    if equi_on is not None:
        cond = equi_on & cond
    return df.join(other, cond)


# ---------- aggregation ----------

def aggregate(
    df: DataFrame, keys: Sequence[str | Column], aggs: Sequence[Column]
) -> DataFrame:
    """Hash aggregate with automatic partial (map-side) + final phases —
    the shuffle moves pre-aggregated partials, not raw rows."""
    return df.groupBy(*keys).agg(*aggs)


def rollup_agg(df, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def distinct(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    return df.dropDuplicates(subset) if subset else df.distinct()


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ — one pass, no giant exact-distinct shuffle; the only
    sane COUNT(DISTINCT) at 100 TB when exactness isn't required."""
    return df.agg(F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}"))


# ---------- sort / limit / top-k ----------

def sort(df: DataFrame, *cols: Column | str) -> DataFrame:
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *order: Column | str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    a k-heap, driver merges k*numPartitions rows — no global sort."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int,
    rank_col: str = "rn", keep_rank: bool = False,
) -> DataFrame:
    """row_number over a window — single shuffle on the group keys. Order
    columns must be a total order (add a unique tiebreaker) or results are
    nondeterministic."""
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


# ---------- set operations ----------

def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)
