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
    """Fused single-pass cosine: one zip_with + one struct-accumulator
    aggregate instead of separate dot/norm passes (the naive composition
    re-evaluates each cast array 3x and walks the vectors 6x — measured
    ~2x slower on the all-pairs near-dup). The fold order of each sum is
    identical to dot()/l2_norm(), so results are bit-for-bit the same —
    required for DuckDB-oracle parity."""
    ad = to_double(a)
    bd = to_double(b)
    terms = F.zip_with(
        ad,
        bd,
        lambda x, y: F.struct(
            (x * y).alias("xy"), (x * x).alias("xx"), (y * y).alias("yy")
        ),
    )
    zero = F.struct(
        F.lit(0.0).alias("xy"), F.lit(0.0).alias("xx"), F.lit(0.0).alias("yy")
    )
    return F.aggregate(
        terms,
        zero,
        lambda acc, s: F.struct(
            (acc["xy"] + s["xy"]).alias("xy"),
            (acc["xx"] + s["xx"]).alias("xx"),
            (acc["yy"] + s["yy"]).alias("yy"),
        ),
        lambda acc: acc["xy"] / (F.sqrt(acc["xx"]) * F.sqrt(acc["yy"])),
    )
