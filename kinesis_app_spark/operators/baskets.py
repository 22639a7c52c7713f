"""Co-occurrence (market-basket) pair mining.

The reference's computation surface is a per-record callback
(/root/reference/src/Kinesis/Coordination.hs:51-53 — no relational
operators); pair mining is part of the forward-defined engine surface
(SURVEY.md §2.2 north-star extensions): co-occurrence statistics are the
first step of association mining and a common feature-engineering pass
over interaction logs.

Scale shape: one distinct-shuffle on (basket, item), then an equi
self-join on the basket key — a hash/sort-merge join, never a cartesian —
with the ``item_a < item_b`` triangle predicate applied as a post-join
filter. The pair count aggregates on (item_a, item_b).

The skew guard mirrors the hot-shingle document-frequency cap in
``operators/dedup.ngram_jaccard_pairs``: a basket with B items emits
B·(B-1)/2 pairs, so one pathological basket (a crawler session touching
every item) is quadratic. Baskets above ``max_basket_size`` are dropped
entirely before the join — the standard market-basket practice, stated in
the result's contract rather than silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_baskets) for every item pair sharing a basket.

    item_a < item_b (each unordered pair once). ``max_basket_size`` drops
    oversized baskets before the quadratic pair expansion; the dropped-
    basket list is tiny by construction (only outliers), so it broadcasts
    into a left_anti.
    """
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    if max_basket_size is not None:
        oversized = (
            items.groupBy("__basket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_basket_size)
            .select("__basket")
        )
        items = items.join(F.broadcast(oversized), "__basket", "left_anti")
    a = items.select("__basket", F.col("__item").alias("item_a"))
    b = items.select("__basket", F.col("__item").alias("item_b"))
    return (
        a.join(b, "__basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
