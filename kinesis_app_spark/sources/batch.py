"""Batch sources: schema-checked parquet/csv/json readers.

Plain ``spark.read`` scans — declared, not hand-scheduled — so Catalyst
gives predicate pushdown, column pruning, and partition pruning for free
(verify with df.explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_app_spark.engine import TABLES

#: event-time columns normalized to session-TZ TIMESTAMP regardless of how
#: the generator wrote them: TIMESTAMP(NANOS) reads as long (via
#: spark.sql.legacy.parquet.nanosAsLong) and is truncated to micros, matching
#: DuckDB's nanos->micros truncation; plain timestamp[us] without tz reads as
#: TIMESTAMP_NTZ and is cast to TIMESTAMP (identity under the engine's UTC
#: session timezone, and what downstream epoch/cast-to-long arithmetic needs —
#: Spark refuses CAST(ntz AS BIGINT)).
NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cols = NANOS_TS_COLS.get(name, ())
    if cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            # integer div, not /: nanos exceed double's 2^53 exact range
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)


def read_csv(spark: SparkSession, path: str, schema, **options) -> DataFrame:
    """CSV with an explicit schema — never infer on big data (full extra scan)."""
    return spark.read.options(**options).csv(path, schema=schema, header=True)


def read_json(spark: SparkSession, path: str, schema, **options) -> DataFrame:
    """JSON with an explicit schema. Pass timestampFormat with micros
    (yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX) when sub-millisecond precision
    matters — the default format is millis and silently truncates."""
    return spark.read.options(**options).json(path, schema=schema)
