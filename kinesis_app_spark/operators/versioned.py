"""Minimal versioned-table layer: Delta-semantics (MERGE + time travel +
optimistic concurrency) emulated over immutable parquet + JSON manifests.

``delta-spark`` is not installed in this container (verified
ImportError), but the SEMANTICS a 100 TB deployment relies on are
engine-expressible without it:

- every version is an immutable set of parquet files under
  ``<table>/data/v<NNNNN>_<token>/``; nothing is ever rewritten in
  place, so any historical version stays readable (time travel);
- a version is COMMITTED by creating ``<table>/_manifest/<NNNNN>.json``
  with O_CREAT|O_EXCL — the same put-if-absent primitive Delta's
  commit protocol needs from its log store. Two writers racing to
  commit the same version: exactly one create succeeds, the loser gets
  ``VersionConflictError`` and must rebase (re-read, re-merge, retry);
- MERGE is the engine's own ``cdc.apply_changes`` (full-outer-join
  upsert/delete with latest-wins compaction) applied copy-on-write:
  read version N, merge, write the new file set, commit N+1.

Scale notes: the merge itself is one key-shuffled full-outer join (AQE
broadcasts small change batches); the commit is O(1) metadata. This
emulation rewrites the full snapshot per version — the honest cost of
copy-on-write without file-level pruning; a production table format
rewrites only touched files, which is an optimization of the write
path, not a semantic difference. Manifests use the local filesystem's
atomic-create; on an object store this primitive comes from the log
store (as it does for Delta on S3).

The reference has no tables at all (opaque stream records,
/root/reference/src/Kinesis/Coordination.hs:51-53); this closes
SURVEY.md §2.2's lakehouse gap oracle-checkably.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_app_spark.operators.cdc import apply_changes


class VersionConflictError(RuntimeError):
    """Another writer committed this version first: rebase and retry."""


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifest")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"{version:05d}.json")


def vt_latest_version(table_dir: str) -> int:
    """Highest committed version, or -1 for a nonexistent table."""
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return -1
    versions = [
        int(f[:-5])
        for f in os.listdir(mdir)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(versions) if versions else -1


def _read_manifest(table_dir: str, version: int) -> dict:
    path = _manifest_path(table_dir, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"version {version} of {table_dir} does not exist"
        )
    with open(path) as fh:
        return json.load(fh)


def _write_data(df: DataFrame, table_dir: str, version: int) -> str:
    token = uuid.uuid4().hex[:8]
    data_dir = os.path.join(table_dir, "data", f"v{version:05d}_{token}")
    df.write.parquet(data_dir)
    return data_dir


def _commit(
    table_dir: str, version: int, data_dir: str, n_rows: int, operation: str,
    batch_id: int | None = None,
) -> None:
    """Atomic put-if-absent commit; on loss, remove the orphaned files."""
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    manifest = {
        "version": version,
        "data_dir": data_dir,
        "n_rows": n_rows,
        "operation": operation,
    }
    if batch_id is not None:
        # streaming epoch ledger: foreachBatch idempotence (Delta's
        # txnAppId/txnVersion discipline) — a replayed epoch finds its
        # batch_id already committed and skips
        manifest["batch_id"] = int(batch_id)
    path = _manifest_path(table_dir, version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        shutil.rmtree(data_dir, ignore_errors=True)
        raise VersionConflictError(
            f"version {version} of {table_dir} was committed concurrently"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)


def vt_create(df: DataFrame, table_dir: str) -> int:
    """Create the table at version 0 from ``df``. Errors if it exists."""
    if vt_latest_version(table_dir) >= 0:
        raise FileExistsError(f"table {table_dir} already exists")
    data_dir = _write_data(df, table_dir, 0)
    n = df.sparkSession.read.parquet(data_dir).count()
    _commit(table_dir, 0, data_dir, n, "CREATE")
    return 0


def vt_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table — latest, or ``VERSION AS OF`` when given."""
    if version is None:
        version = vt_latest_version(table_dir)
        if version < 0:
            raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _read_manifest(table_dir, version)
    if manifest.get("vacuumed"):
        raise FileNotFoundError(
            f"version {version} of {table_dir} was vacuumed; earliest "
            "readable version is the oldest non-vacuumed manifest"
        )
    return spark.read.parquet(manifest["data_dir"])


def vt_merge(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
    expected_version: int | None = None,
    batch_id: int | None = None,
    merge_schema: bool = False,
    check: str | None = None,
) -> int:
    """MERGE INTO, copy-on-write, optimistically-concurrent.

    Reads the latest snapshot, applies ``changes`` via
    ``cdc.apply_changes``, writes the new immutable file set, and
    commits the next version. ``expected_version`` is the version this
    writer based its changes on: if another commit landed in between,
    ``VersionConflictError`` is raised BEFORE any data is written (and
    the create-race is still resolved atomically at commit time).

    ``merge_schema=True`` is Delta's schema-evolution-on-MERGE: columns
    present in ``changes`` but not in the snapshot are ADDED (null for
    every pre-existing row); without it an unexpected column raises —
    silent column drops are how pipelines lose data. Old versions keep
    their old schema (evolution is forward-only, like the table
    formats).

    ``check`` is a CHECK-constraint SQL predicate evaluated over the
    MERGED result BEFORE anything is written: any violating row aborts
    the merge (no version is committed, the table is untouched) — the
    quality gate belongs in the commit path, not a day-later audit.
    """
    base = vt_latest_version(table_dir)
    if base < 0:
        raise FileNotFoundError(f"table {table_dir} does not exist")
    if expected_version is not None and base != expected_version:
        raise VersionConflictError(
            f"expected version {expected_version}, table is at {base}"
        )
    snapshot = vt_read(spark, table_dir, base)
    reserved = {op_col, seq_col}
    extra = [
        f for f in changes.schema.fields
        if f.name not in snapshot.columns and f.name not in reserved
    ]
    if extra and not merge_schema:
        raise ValueError(
            f"vt_merge: changes carry new columns "
            f"{[f.name for f in extra]}; pass merge_schema=True to evolve "
            "the table schema (refusing to silently drop them)"
        )
    for f in extra:
        snapshot = snapshot.withColumn(f.name, F.lit(None).cast(f.dataType))
    merged = apply_changes(
        snapshot, changes, keys=keys, op_col=op_col, seq_col=seq_col
    )
    if check is not None:
        n_bad = merged.filter(f"NOT ({check})").count()
        if n_bad:
            raise ValueError(
                f"vt_merge: CHECK ({check}) violated by {n_bad} row(s); "
                "merge aborted, no version committed"
            )
    new_version = base + 1
    data_dir = _write_data(merged, table_dir, new_version)
    n = spark.read.parquet(data_dir).count()
    _commit(table_dir, new_version, data_dir, n, "MERGE", batch_id=batch_id)
    return new_version


def vt_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """(version, operation, n_rows) per committed version — the DESCRIBE
    HISTORY surface (no wall-clock columns: the gate needs determinism)."""
    latest = vt_latest_version(table_dir)
    rows = []
    for v in range(latest + 1):
        m = _read_manifest(table_dir, v)
        rows.append((m["version"], m["operation"], m["n_rows"]))
    return spark.createDataFrame(
        rows, "version int, operation string, n_rows long"
    )


def vt_optimize(
    spark: SparkSession,
    table_dir: str,
    cluster_cols: Sequence[str],
    max_records_per_file: int = 65536,
) -> int:
    """OPTIMIZE: rewrite the latest snapshot range-clustered on
    ``cluster_cols`` and commit it as a new version with IDENTICAL rows
    — the table-maintenance half of a lakehouse (compaction + layout),
    distinct from MERGE which changes data. Range clustering gives
    disjoint per-file key ranges, so parquet footer min/max skipping
    prunes on the cluster key afterwards (the engine's
    parquet_compaction_orders discipline applied to the versioned
    layer). Old versions stay readable — OPTIMIZE is just another
    immutable file set."""
    base = vt_latest_version(table_dir)
    if base < 0:
        raise FileNotFoundError(f"table {table_dir} does not exist")
    df = vt_read(spark, table_dir, base)
    # sortWithinPartitions matters even with range partitioning: AQE can
    # coalesce a small range shuffle to fewer partitions, and
    # maxRecordsPerFile then chops each task's UNSORTED stream into
    # overlapping-range files — the local sort keeps every emitted file
    # a contiguous key span
    clustered = df.repartitionByRange(
        *[F.col(c) for c in cluster_cols]
    ).sortWithinPartitions(*[F.col(c) for c in cluster_cols])
    new_version = base + 1
    token = uuid.uuid4().hex[:8]
    data_dir = os.path.join(table_dir, "data", f"v{new_version:05d}_{token}")
    clustered.write.option(
        "maxRecordsPerFile", max_records_per_file
    ).parquet(data_dir)
    n = spark.read.parquet(data_dir).count()
    _commit(table_dir, new_version, data_dir, n, "OPTIMIZE")
    return new_version


def vt_changes(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    keys: Sequence[str],
) -> DataFrame:
    """Change data feed between two versions: every row labeled
    ``_change_type`` in {insert, delete, update_preimage,
    update_postimage} (Delta CDF's row vocabulary), derived by a
    key-keyed full-outer join of the two immutable snapshots with
    null-safe value comparison. One shuffle per side on the key; at
    scale diff the two versions' file-level stats first to prune
    untouched ranges (not needed here — the emulation has no file
    statistics index)."""
    keys = list(keys)
    before = vt_read(spark, table_dir, v_from)
    after = vt_read(spark, table_dir, v_to)
    value_cols = [c for c in before.columns if c not in keys]
    a = before.select(
        *keys, *[F.col(c).alias(f"__a_{c}") for c in value_cols],
        F.lit(1).alias("__in_a"),
    )
    b = after.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in value_cols],
        F.lit(1).alias("__in_b"),
    )
    j = a.join(b, keys, "full_outer")
    differs = None
    for c in value_cols:
        d = ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        differs = d if differs is None else (differs | d)

    def image(side: str, label: str) -> DataFrame:
        return sel.select(
            F.lit(label).alias("_change_type"),
            *keys,
            *[F.col(f"__{side}_{c}").alias(c) for c in value_cols],
        )

    out = []
    sel = j.filter(F.col("__in_a").isNull())
    out.append(image("b", "insert"))
    sel = j.filter(F.col("__in_b").isNull())
    out.append(image("a", "delete"))
    upd = j.filter(
        F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull() & differs
    )
    sel = upd
    out.append(image("a", "update_preimage"))
    out.append(image("b", "update_postimage"))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def vt_committed_batch_ids(table_dir: str) -> set[int]:
    """Streaming-epoch ledger: every batch_id a committed version
    carries (see ``vt_foreach_batch_merger``)."""
    out: set[int] = set()
    for v in range(vt_latest_version(table_dir) + 1):
        m = _read_manifest(table_dir, v)
        if "batch_id" in m:
            out.add(int(m["batch_id"]))
    return out


def vt_foreach_batch_merger(
    spark: SparkSession,
    table_dir: str,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
):
    """foreachBatch sink that MERGEs each micro-batch into the versioned
    table EXACTLY ONCE: the epoch's batch_id is written into the commit
    manifest, and a replayed epoch (at-least-once delivery after a
    restart) finds its batch_id in the ledger and skips — Delta's
    txnAppId/txnVersion idempotence discipline on this layer, and the
    engine-side version of the reference's ack/checkpoint protocol
    (src/Kinesis/Coordination.hs:329-337: progress recorded durably so
    redelivery cannot double-apply).

    Usage: ``stream.writeStream.foreachBatch(vt_foreach_batch_merger(
    spark, table, keys=["k"], seq_col="seq"))``.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in vt_committed_batch_ids(table_dir):
            return  # replayed epoch: already merged
        vt_merge(
            spark,
            table_dir,
            batch_df,
            keys=keys,
            op_col=op_col,
            seq_col=seq_col,
            batch_id=int(batch_id),
        )

    return apply_batch


def vt_vacuum(table_dir: str, retain_last: int = 2) -> list[int]:
    """VACUUM: delete the data files of versions older than the last
    ``retain_last`` — the storage-reclaim half of table maintenance
    (copy-on-write keeps every version's full file set, so retention is
    what bounds disk at 100 TB). Vacuumed manifests stay, marked
    ``vacuumed: true``: history remains auditable, but reading a
    vacuumed version raises a clear error instead of a missing-file
    stack (the Delta VACUUM contract). The latest version can never be
    vacuumed. Returns the list of vacuumed version numbers."""
    latest = vt_latest_version(table_dir)
    if latest < 0:
        raise FileNotFoundError(f"table {table_dir} does not exist")
    keep_from = max(0, latest - max(1, retain_last) + 1)
    # RESTORE commits re-reference an older version's data dir, so the
    # same dir can back several versions: never delete a dir a RETAINED
    # version still points at (file-level reference counting, the job
    # a table format's log does)
    referenced = {
        _read_manifest(table_dir, v)["data_dir"]
        for v in range(keep_from, latest + 1)
    }
    vacuumed = []
    for v in range(keep_from):
        m = _read_manifest(table_dir, v)
        if m.get("vacuumed"):
            continue
        if m.get("external"):
            # shallow-cloned version: the data files belong to the
            # SOURCE table — deleting them here would corrupt it
            continue
        if m["data_dir"] in referenced:
            continue  # still backs a retained version (RESTORE target)
        shutil.rmtree(m["data_dir"], ignore_errors=True)
        m["vacuumed"] = True
        # single-writer metadata update (vacuum is a maintenance job,
        # not a concurrent commit): rewrite in place via temp + rename
        tmp = _manifest_path(table_dir, v) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, _manifest_path(table_dir, v))
        vacuumed.append(v)
    return vacuumed


def vt_clone(table_dir: str, clone_dir: str) -> int:
    """SHALLOW CLONE: copy the commit manifests; the (immutable) data
    files are SHARED with the source — a zero-copy fork for
    experiments/backfills, exactly Delta's CLONE semantics. New commits
    on the clone write under the clone's own data dir, so the source is
    never touched. Cloned versions are marked ``external: true`` and
    ``vt_vacuum`` skips them: vacuuming a clone must never delete files
    the SOURCE still references (the classic shallow-clone VACUUM
    hazard, guarded here by construction). Returns the cloned latest
    version."""
    latest = vt_latest_version(table_dir)
    if latest < 0:
        raise FileNotFoundError(f"table {table_dir} does not exist")
    if vt_latest_version(clone_dir) >= 0:
        raise FileExistsError(f"clone target {clone_dir} already exists")
    os.makedirs(_manifest_dir(clone_dir), exist_ok=True)
    for v in range(latest + 1):
        m = _read_manifest(table_dir, v)
        m["external"] = True  # data files belong to the source table
        with open(_manifest_path(clone_dir, v), "w") as fh:
            json.dump(m, fh)
    return latest


def vt_restore(spark: SparkSession, table_dir: str, version: int) -> int:
    """RESTORE TO VERSION AS OF: commit a NEW version whose data is the
    target version's (zero-copy — the new manifest references the old
    immutable file set; ``vt_vacuum`` is reference-aware so the shared
    dir survives as long as any retained version points at it). History
    is append-only: a restore never rewrites the log, it adds a commit
    — the audit trail keeps both the mistake and the fix."""
    latest = vt_latest_version(table_dir)
    if latest < 0:
        raise FileNotFoundError(f"table {table_dir} does not exist")
    target = _read_manifest(table_dir, version)
    if target.get("vacuumed"):
        raise FileNotFoundError(
            f"cannot restore to vacuumed version {version}"
        )
    new_version = latest + 1
    _commit(
        table_dir,
        new_version,
        target["data_dir"],
        int(target["n_rows"]),
        f"RESTORE({version})",
    )
    return new_version
