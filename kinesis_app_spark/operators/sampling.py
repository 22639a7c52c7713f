"""Deterministic weighted sampling without replacement (A-ES).

Efraimidis–Spirakis: each row draws u in (0,1) and scores
``key = u^(1/w)``; the k largest keys are a weighted sample without
replacement. One pass, no per-group state, and the top-k plans as
TakeOrderedAndProject (per-partition heaps + driver merge of k·P rows) —
no global sort, the only shape that works when the input is 100 TB and
the sample is 10^3 rows.

Determinism: u is derived from a hash of the row's id
(md5 hex prefix → 32-bit integer / 2^32), not from a RNG — the same row
always draws the same u, so the sample is reproducible across runs,
engines, and partitionings (md5 and the hex→int conversion are available
and identical in DuckDB, which is how the oracle replicates it exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_u(id_str: Column) -> Column:
    """Uniform-ish u in [0,1) from md5 of a row-id string: first 8 hex
    chars as a 32-bit integer over 2^32. Exactly representable in double,
    so cross-engine comparisons are exact."""
    return (
        F.conv(F.substring(F.md5(id_str), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )


def weighted_sample(
    df: DataFrame,
    id_str: Column,
    weight: Column,
    k: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """k-row weighted sample without replacement, deterministic in the row
    ids. Rows with non-positive weight are excluded (their inclusion
    probability is 0). Adds a ``__key`` column callers typically drop."""
    keyed = df.filter(weight > 0).withColumn(
        "__key", F.pow(deterministic_u(id_str), F.lit(1.0) / weight)
    )
    order = [F.desc("__key"), *[F.col(c) for c in (tiebreak or [])]]
    return keyed.orderBy(*order).limit(k)
