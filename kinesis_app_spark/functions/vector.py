"""Vector math over array<float>/array<double> columns — pure Column algebra.

Used by similarity search and embedding-based dedup. Implemented with
``F.zip_with`` + ``F.aggregate`` so the arithmetic runs JVM-side per row —
no Python boundary, no shuffle. For the 100 TB path the brute-force matmul
variant lives in operators/similarity.py (Arrow-batched numpy); these column
expressions are the exact-semantics baseline and are what the DuckDB oracle
(list_cosine_similarity) is compared against.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """Cast array<float> -> array<double> so accumulation is double-precision
    (matches DuckDB, which computes list similarity in double)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    a = to_double(a)
    b = to_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
