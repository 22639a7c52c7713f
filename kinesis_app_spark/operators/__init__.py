"""Operator surface of the engine.

The reference delegates ALL computation over record contents to one opaque
callback (``Processor``, src/Kinesis/Coordination.hs:51-53) — it has zero
relational operators (SURVEY.md §2). This package is the engine surface that
replaces that callback with a declarative, Catalyst-optimized operator set,
plus the LLM-data-pipeline operators (dedup, similarity, text analysis,
multimodal) the north star mandates.

Every operator is a pure ``DataFrame -> DataFrame`` function, so batch and
streaming share one code path.
"""

from kinesis_app_spark.operators import relational  # noqa: F401
