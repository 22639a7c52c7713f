"""Co-occurrence (market-basket) pair mining.

The reference's computation surface is a per-record callback
(/root/reference/src/Kinesis/Coordination.hs:51-53 — no relational
operators); pair mining is part of the forward-defined engine surface
(SURVEY.md §2.2 north-star extensions): co-occurrence statistics are the
first step of association mining and a common feature-engineering pass
over interaction logs.

Scale shape: ONE shuffle on the basket key folds each basket to a sorted
distinct item-array row (collect_set is the distinct), then the i<j pairs
expand INSIDE the row as a codegen transform — never a self-join, never a
cartesian. The pair count aggregates on (item_a, item_b).

The skew guard mirrors the hot-shingle document-frequency cap in
``operators/dedup.ngram_jaccard_pairs``: a basket with B items emits
B·(B-1)/2 pairs, so one pathological basket (a crawler session touching
every item) is quadratic. Baskets above ``max_basket_size`` are dropped
by a size gate in the same projection that expands pairs — the standard
market-basket practice, stated in the result's contract rather than
silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_arrays(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """One row per basket: (``__basket``, ``__arr`` = sorted distinct items).

    ``collect_set`` dedupes, so the fold IS the distinct — one shuffle on
    the basket key total, not distinct + groupBy (two shuffles on the same
    key: measured one full Exchange saved per consumer at sf0.1).
    ``max_basket_size`` gates oversized baskets in-row (``size(__arr)``)
    — no sizes-subquery join needed.

    NULL items are EXCLUDED by design: ``collect_set`` drops NULLs, so a
    NULL item never counts toward basket size, supports, or pair-basket
    membership. (The pre-round-8 ``distinct()`` shape counted a NULL
    item toward basket size; all in-repo callers pass non-null TPC-H
    keys, and exclusion is the standard market-basket semantics — an
    unknown item is not an item.) Filter upstream if a caller needs a
    NULL bucket.
    """
    baskets = (
        df.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        )
        .groupBy("__basket")
        .agg(F.sort_array(F.collect_set("__item")).alias("__arr"))
    )
    if max_basket_size is not None:
        # the size gate subsumes the old broadcast left_anti: oversized
        # baskets drop in the same projection that expands pairs
        baskets = baskets.filter(F.size("__arr") <= max_basket_size)
    return baskets


def pair_counts_from_arrays(baskets: DataFrame) -> DataFrame:
    """(item_a, item_b, n_baskets) from ``basket_arrays`` output.

    The i<j pairs expand INSIDE the row (codegen transform) — never a
    self-join, never a cartesian; the count aggregates on the pair key.
    collect_set order is run-dependent but sort_array pins it, so pair
    emission is deterministic.
    """
    pairs = F.flatten(
        F.transform(
            F.col("__arr"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("__arr"), i + 2, F.size(F.col("__arr")) - i - 1
                ),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_baskets) for every item pair sharing a basket.

    item_a < item_b (each unordered pair once). ``max_basket_size`` drops
    oversized baskets before the quadratic pair expansion.
    """
    return pair_counts_from_arrays(
        basket_arrays(df, basket_col, item_col, max_basket_size)
    )
