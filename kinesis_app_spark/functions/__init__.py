"""Scalar-function layer: vector, text, and JSON helpers.

Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen eligible. No
Python UDFs in this package: at 100 TB the scalar layer must stay inside
Tungsten.
"""

from kinesis_app_spark.functions.vector import cosine_similarity, dot, l2_norm
from kinesis_app_spark.functions.text import (
    fingerprint,
    normalize_ws,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "fingerprint",
    "normalize_ws",
    "token_count",
    "tokens",
    "word_shingles",
]
