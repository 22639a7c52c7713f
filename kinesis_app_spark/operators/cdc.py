"""Change-data-capture application: MERGE-INTO semantics as a pure
DataFrame operator (no table-format dependency).

The reference's world is append-only streams; real pipelines also need to
APPLY a change batch (upserts + deletes) onto a snapshot — Delta/Iceberg
``MERGE INTO`` — and the relational core of that statement is expressible
as one full-outer join:

    snapshot FULL OUTER JOIN changes ON key
      match + op=U  -> take change row      (update)
      match + op=D  -> drop                 (delete)
      match + no-op -> keep snapshot row
      no-match + U  -> take change row      (insert)

One shuffle per side on the key; at 100 TB the snapshot side is the big
one and the change batch is typically small — AQE turns the join into a
broadcast automatically, so applying a daily change-set costs one snapshot
scan. Latest-change-wins within the batch is resolved first with a
max-by window (the standard CDC compaction step).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 view of an event/change log: each
    row becomes a validity interval [valid_from, valid_to) closed by the
    key's next change (null valid_to = current version).

    One shuffle on the key; the interval close is a lead() window — no
    self-join. ``order_cols`` breaks ordering ties after the timestamp
    (pass the change id for a total order).
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    return df.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        (F.lead(ts_col).over(w).isNull()).alias("is_current"),
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a change batch to a snapshot; returns the new snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` with 'U'
    (upsert), 'I' (insert — same column semantics as 'U'; accepted so a
    CDC feed's insert rows never silently degrade), or 'D' (delete).
    With ``seq_col`` set, multiple changes per key compact to the
    highest sequence first (latest wins, ties broken by op ascending —
    'D' < 'I' < 'U' — so a same-seq delete wins deterministically).
    Round-8 note: 'I' used to fall outside the contract and silently
    took the SNAPSHOT side's values — null for a genuinely new key, a
    hard-to-spot corruption for the one op code every CDC source emits.
    """
    keys = list(keys)
    if seq_col is not None:
        w = Window.partitionBy(*keys).orderBy(
            F.desc(seq_col), F.asc(op_col)  # 'D' < 'U': delete wins ties
        )
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    value_cols = [c for c in snapshot.columns if c not in keys]
    s = snapshot.alias("s")
    c = changes.alias("c")
    joined = s.join(c, keys, "full_outer")
    keep = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    take_change = F.col(f"c.{op_col}").isin("U", "I")
    return joined.filter(keep).select(
        *[F.col(k) for k in keys],
        *[
            F.when(take_change, F.col(f"c.{v}"))
            .otherwise(F.col(f"s.{v}"))
            .alias(v)
            for v in value_cols
        ],
    )
