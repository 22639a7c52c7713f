"""Streaming sources: file/rate for tests, Kinesis connector config for prod.

The Kinesis reader builder maps every operational knob the reference
exposes onto the public Spark Kinesis connector option surface:

| reference knob | file:line | connector option |
|---|---|---|
| stream name (`_appStream`) | src/Kinesis/Types.hs:51-52 | `streamName` |
| start `Latest` (no checkpoint) | src/Kinesis/Kinesis.hs:62-64 | `startingPosition=LATEST` |
| resume `AfterSequenceNumber` | src/Kinesis/Kinesis.hs:64-65 | automatic via checkpointLocation |
| `configRecordBatch` fetch limit | src/Kinesis/Types.hs:79-80 | `maxFetchRecordsPerShard` |
| 1 s empty-poll sleep | src/Kinesis/Kinesis.hs:76 | trigger interval |
| region (hard-coded UsEast1!) | src/Kinesis/Kinesis.hs:100 | `region` (configurable — intentional fix) |

The connector jar is not in this container, so `kinesis_stream_reader`
only *builds* the configured reader; calling .load() without the jar
raises Spark's own data-source-not-found error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.readwriter import DataStreamReader
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Deterministic test source: directory of files consumed as a stream.
    `maxFilesPerTrigger` is the batch-size knob (the reference's
    `configRecordBatch` analogue for tests)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source (columns: timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kinesis_stream_reader(
    spark: SparkSession,
    stream_name: str,
    region: str = "us-east-1",
    starting_position: str = "LATEST",
    max_fetch_records_per_shard: int | None = None,
    endpoint_url: str | None = None,
    fmt: str = "aws-kinesis",
) -> DataStreamReader:
    """Configured (unloaded) reader for a Kinesis stream.

    `starting_position`: LATEST (reference default, src/Kinesis/Kinesis.hs:63)
    | TRIM_HORIZON | AT_TIMESTAMP. Resume-after-checkpoint needs no option:
    with a checkpointLocation the offset log wins, which is the reference's
    `AfterSequenceNumber` path (src/Kinesis/Kinesis.hs:64-65) done right.
    """
    reader = (
        spark.readStream.format(fmt)
        .option("streamName", stream_name)
        .option("region", region)
        .option("startingPosition", starting_position)
    )
    if max_fetch_records_per_shard is not None:
        reader = reader.option(
            "maxFetchRecordsPerShard", str(max_fetch_records_per_shard)
        )
    if endpoint_url:
        reader = reader.option("endpointUrl", endpoint_url)
    return reader
