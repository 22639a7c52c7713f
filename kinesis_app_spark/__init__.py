"""kinesis_app_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference stream-consumer framework
(Soostone/kinesis-app, surveyed in SURVEY.md) Spark-first:

- the reference's coordination machinery (shard discovery, assignment,
  checkpointing, failure recovery — src/Kinesis/Coordination.hs) collapses
  into Spark Structured Streaming configuration (``kinesis_app_spark.streaming``);
- the query surface the reference delegates to an opaque user ``Processor``
  callback (src/Kinesis/Coordination.hs:51-53) becomes a full, declarative
  DataFrame operator surface (``kinesis_app_spark.operators``), optimized by
  Catalyst and designed for 100 TB scale;
- on top, the LLM-data-pipeline operators: dedup, similarity search,
  multimodal columns, text analysis.

Everything here is public PySpark API only.
"""

from kinesis_app_spark.engine import Engine, get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
