"""Pin strategy for multiply-consumed / iteratively-rebuilt subtrees.

Round 8 introduced ``localCheckpoint(eager=False)`` pins on every shared
expensive subtree (a consumer re-executing the subtree per reference was
the single largest waste class found by measurement). ``localCheckpoint``
is the right LOCAL-MODE tool: it materializes to executor-local block
storage with no replication and truncates lineage, so N consumers run the
subtree once. On a real cluster it trades fault tolerance away — an
executor loss makes the pinned partitions unrecoverable (no lineage left
to recompute) and it pins blocks to executors, which is hostile to
dynamic allocation.

The round-8 verdict asked for that trade-off to be a KNOB, not a comment
(VERDICT r8, "Next round" item 7). ``pin()`` is that knob; the strategy
comes from ``$SPARK_GRAFT_PIN``:

- ``local`` (default): ``localCheckpoint(eager=...)`` — fastest on one
  box, zero fault tolerance for the pinned blocks. What the local bench
  and the driver's gates run.
- ``persist_disk``: ``persist(StorageLevel.DISK_ONLY)`` — consumers after
  the first read the materialized blocks, and a lost block is recomputed
  from lineage (fault-tolerant). Lineage is NOT truncated, so prefer
  ``reliable`` for unbounded iteration (plan growth returns otherwise).
- ``reliable``: ``DataFrame.checkpoint(eager=...)`` — materializes to the
  (reliable, replicated at cluster scale) checkpoint directory and
  truncates lineage; survives executor loss. The 100 TB default posture.
  A checkpoint dir is set lazily under the Hadoop default FS if the
  caller has not configured one.
- ``none``: no pin at all — full lineage everywhere. Used by plan-audit
  tests that must see through the pin, and as the escape hatch.

Semantics: a pin NEVER changes what a query computes — every strategy
(including ``none``) yields the same rows. Pre-mutation SNAPSHOTS (a
DataFrame captured eagerly before its source is mutated, e.g. the dedup
index screen verdicts) are NOT routed through ``pin()``: those require
materialization for correctness and keep an explicit eager
``localCheckpoint``/``checkpoint`` at the call site.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_VALID = ("local", "persist_disk", "reliable", "none")


def pin_strategy() -> str:
    s = os.environ.get("SPARK_GRAFT_PIN", "local")
    return s if s in _VALID else "local"


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize-once marker for a subtree consumed more than once (or
    rebuilt per iteration). Strategy per ``$SPARK_GRAFT_PIN`` above."""
    s = pin_strategy()
    if s == "none":
        return df
    if s == "persist_disk":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        return out
    if s == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():  # noqa: SLF001
            import tempfile

            sc.setCheckpointDir(
                tempfile.mkdtemp(prefix="spark_reliable_ckpt_")
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
