"""Interval-overlap join: all pairs (a, b) with
``a.start < b.end AND b.start < a.end``, without a nested-loop join.

Spark has no native interval join (the reference has no relational surface
at all — /root/reference/src/Kinesis/Coordination.hs:51-53); expressing
the overlap predicate directly gives Catalyst a BroadcastNestedLoopJoin —
O(|A|·|B|). The scale shape is **grid binning**, the standard trick from
temporal/spatial databases:

1. Chop the timeline into fixed cells of width >= the longer side's
   maximum interval length (so an interval spans at most 2 consecutive
   cells, and any overlapping pair shares at least one cell).
   Actually each side replicates into every cell it touches.
2. Equi-join on the cell id — a hash join; candidate count is
   sum over cells of |A_cell|·|B_cell|, not |A|·|B|.
3. Apply the exact overlap predicate as a post-join filter.
4. **Cell-ownership dedup, shuffle-free**: a pair overlapping in several
   shared cells would be emitted once per cell; instead of a distinct()
   shuffle, only the cell containing ``greatest(a.start, b.start)`` (the
   first instant of the actual overlap) emits the pair — exactly one cell
   owns each pair, by construction.

Skew note: a cell holding a hot burst of intervals is the usual hot-key
problem — pick the cell width to bound per-cell membership, or salt the
hot cells like operators/scale.salted_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    cell_width: int,
    start_col: str = "start",
    end_col: str = "end",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Pairs of half-open intervals [start, end) from ``a`` and ``b`` that
    overlap. start/end are numeric (epoch seconds, positions, …).

    Every non-interval column is carried through with its side's suffix;
    the interval bounds are emitted suffixed as well. ``cell_width`` must
    be positive; intervals may span any number of cells (each side
    replicates into every cell it touches via sequence+explode).
    """
    if cell_width <= 0:
        raise ValueError("interval_overlap_join: cell_width must be positive")

    def cells(df: DataFrame, suffix: str) -> DataFrame:
        s, e = F.col(start_col), F.col(end_col)
        cell = F.explode(
            F.sequence(
                F.floor(s / cell_width),
                # half-open: an interval ending exactly on a cell boundary
                # does not touch that cell
                F.floor((e - 1) / cell_width),
            )
        ).alias("__cell")
        renamed = df.select(
            *[F.col(c).alias(c + suffix) for c in df.columns], cell
        )
        return renamed

    ca = cells(a, suffixes[0])
    cb = cells(b, suffixes[1])
    sa, ea = F.col(start_col + suffixes[0]), F.col(end_col + suffixes[0])
    sb, eb = F.col(start_col + suffixes[1]), F.col(end_col + suffixes[1])
    overlap = (sa < eb) & (sb < ea)
    owner = F.floor(F.greatest(sa, sb) / cell_width) == F.col("__cell")
    return ca.join(cb, "__cell").filter(overlap & owner).drop("__cell")
