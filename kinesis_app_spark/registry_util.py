"""Shared plumbing for the query-registry modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from kinesis_app_spark.sources.batch import load_table

    return load_table(spark, sf_dir, name)
