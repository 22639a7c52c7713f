"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Inputs estimated below this are "narrow": worth a cheap repartition so
#: per-row CPU-heavy work (signatures, hashes, vector math) parallelizes.
#: Anything larger already yields plenty of scan partitions from
#: spark.sql.files.maxPartitionBytes splitting and passes through untouched.
_SMALL_INPUT_BYTES = 1 << 30  # 1 GiB


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition narrow inputs so per-row CPU-heavy work parallelizes.

    A small table read from a single parquet file arrives as ONE input
    partition, which would serialize signature/hash/vector computation on a
    single core no matter how many the cluster has.

    The decision comes from Catalyst's estimated plan size — pure plan
    analysis, no job. Deliberately NOT ``df.rdd.getNumPartitions()``: that
    forces a DataFrame->RDD plan conversion at build time for every caller
    and can pin plan shapes AQE would otherwise improve. At 100 TB the
    size estimate exceeds the threshold and spread() is an exact no-op.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — stats are an optimization, not a need
        size = 0  # unknown size: treat as narrow (repartition is safe)
    if size < _SMALL_INPUT_BYTES:
        return df.repartition(target)
    return df


def bind_row(df: DataFrame, expr, alias: str) -> DataFrame:
    """Append ``expr`` as a column that is evaluated EXACTLY once per row.

    ``df.withColumn(alias, expr)`` does not guarantee this: CollapseProject
    inlines the expression into every downstream projection/filter that
    references the column, so an expensive expression (a higher-order
    function fold — CodegenFallback, no common-subexpression elimination)
    re-evaluates once per reference. Wrapping it as ``explode(array(expr))``
    puts it behind a Generate node, which CollapseProject cannot cross;
    downstream references become plain attribute reads. ``array(expr)``
    always has one element, so the row count is unchanged. Per-row map
    operation — no shuffle, scales with the scan.
    """
    from pyspark.sql import functions as F

    return df.select("*", F.explode(F.array(expr)).alias(alias))
