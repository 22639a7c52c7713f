"""Record linkage / entity resolution: blocked candidate generation +
edit-distance verification.

The reference has no relational surface (its computation surface is the
per-record callback at /root/reference/src/Kinesis/Coordination.hs:51-53);
linkage is part of the forward-defined engine surface — matching dirty
records against a canonical table is the classic data-integration job, and
at 100 TB the only viable shape is:

1. **Block**: derive a cheap deterministic key that dirt cannot touch
   (here: a substring outside the noisy positions; in general: phonetic
   codes, sorted-token prefixes, geohash cells, …) and equi-join on it.
   This is a hash join on the block key — candidate count is
   sum(|block_a| * |block_b|) per key, NOT |A| * |B|.
2. **Verify**: exact edit distance only on candidates, inside codegen
   (levenshtein is a built-in).

Never a cartesian: the plan test asserts no nested-loop join appears.
A block key that collides too often is the skew hole (same as a hot
shingle in n-gram dedup) — cap or split hot blocks if the key is weak.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_link(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    text_col: str,
    max_dist: int = 1,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Candidate pairs from an equi-join on ``block_cols``, kept when
    ``levenshtein(left.text, right.text) <= max_dist``.

    Both inputs must already carry the block columns. Every non-block
    column is emitted with the corresponding suffix; the edit distance is
    emitted as ``dist``.
    """
    lcols = [c for c in left.columns if c not in block_cols]
    rcols = [c for c in right.columns if c not in block_cols]
    a = left.select(
        *block_cols, *[F.col(c).alias(c + suffixes[0]) for c in lcols]
    )
    b = right.select(
        *block_cols, *[F.col(c).alias(c + suffixes[1]) for c in rcols]
    )
    dist = F.levenshtein(
        F.col(text_col + suffixes[0]), F.col(text_col + suffixes[1])
    )
    return (
        a.join(b, list(block_cols))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
    )
