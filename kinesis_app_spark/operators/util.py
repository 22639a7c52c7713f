"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition narrow inputs so per-row CPU-heavy work parallelizes.

    A small table read from a single parquet file arrives as ONE input
    partition, which would serialize signature/hash/vector computation on a
    single core no matter how many the cluster has. At 100 TB the input
    already has thousands of partitions and this is a no-op; the check costs
    a plan analysis, not a job.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
