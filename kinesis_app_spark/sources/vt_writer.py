"""Versioned-table APPEND as a registered Spark SINK (``vt_table``).

Closes the source/sink symmetry with ``vt_cdf``: a stream (or batch
job) INSERTs into a versioned table through Spark's own sink protocol —

    df.writeStream.format("vt_table")
      .option("path", table_dir)
      .option("checkpointLocation", ckpt).start()

Scope is APPEND, deliberately: the Python DataSource writer's
``commit`` phase runs in a sessionless worker process (no
SparkSession), so a keyed MERGE cannot run there — exactly the
constraint that makes Delta's own streaming sink append-only with
MERGE routed through foreachBatch. The engine has the same split:
this sink for ingestion appends, ``vt_foreach_batch_merger`` for keyed
upserts. What the sink CAN do it does with full manifest fidelity,
because an append is pure file+metadata work:

- ``write(iterator)`` runs per TASK on executors: the partition's rows
  are staged as one parquet file under ``<table>/_stage/`` (pyarrow,
  columnar, typed by the declared schema); the path travels back in
  the commit message — rows never pass through the driver.
- ``commit(messages, batchId)`` promotes the epoch's staged files into
  ``data/`` (same-filesystem rename, no copy), computes per-file
  min/max stats pyarrow-side in the SAME JSON-portable form the Spark
  writers produce (so merge pruning / vt_scan skipping work on
  sink-written files identically), and commits an incremental APPEND
  manifest carrying ``batch_id=batchId`` — a REPLAYED epoch finds
  itself in the ledger and skips: exactly-once at append granularity.
  Appends read no existing file, so a commit race needs no conflict
  analysis: the loser re-derives the carried set and re-commits
  (bounded spins, like ``_commit_optimistic`` with an always-disjoint
  writer).
- ``abort`` removes the epoch's staged files; task attempts that died
  before messaging leave orphans under ``_stage/`` — never referenced
  by any manifest, removed with the directory.

The table is created on first use from the stream's schema — also
sessionless (an empty-file-set CREATE manifest).

Reference parity: the reference's Processor write path (records → user
processor → durable state, /root/reference/src/Kinesis/
Coordination.hs:100-107) with the durable state generalized to a
versioned lakehouse table; batchId plays the ack/checkpoint role
(Coordination.hs:329-337).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from kinesis_app_spark.operators import versioned as VT

__all__ = ["VersionedTableDataSource", "register"]

_APPEND_MAX_SPINS = 50


class VtStageMsg(WriterCommitMessage):
    def __init__(self, path: str | None, n_rows: int):
        self.path = path
        self.n_rows = n_rows


def _conn(options, schema: StructType) -> dict:
    path = options.get("path")
    if not path:
        raise ValueError("vt_table: option 'path' (the table dir) is "
                         "required")
    return {
        "path": path,
        "schema_json": json.dumps(schema.jsonValue()),
    }


def _ensure_table(conn: dict) -> None:
    """Create the table on first use — SESSIONLESS: an empty-file-set
    CREATE manifest written directly (the writer phases have no
    SparkSession). A concurrent creator winning the race is fine."""
    if VT.vt_latest_version(conn["path"]) >= 0:
        return
    schema_json = json.loads(conn["schema_json"])
    try:
        VT._commit(
            conn["path"], 0,
            {
                "data_dir": None,
                "files": [],
                "n_rows": 0,
                "schema": schema_json,
                "operation": "CREATE",
            },
        )
    except VT.VersionConflictError:
        pass  # someone else created it — equally good


def _stage_rows(conn: dict, iterator) -> VtStageMsg:
    """Executor-side: drain the task's rows into ONE staged parquet
    file, columnar via pyarrow under the declared schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = StructType.fromJson(json.loads(conn["schema_json"]))
    target = to_arrow_schema(schema)
    rows = list(iterator)
    if not rows:
        return VtStageMsg(None, 0)
    cols = {
        f.name: pa.array([r[i] for r in rows], f.type)
        for i, f in enumerate(target)
    }
    stage_dir = os.path.join(conn["path"], "_stage")
    os.makedirs(stage_dir, exist_ok=True)
    out = os.path.join(stage_dir, f"{uuid.uuid4().hex}.parquet")
    pq.write_table(pa.table(cols, schema=target), out)
    return VtStageMsg(out, len(rows))


def _pa_file_stats(path: str, schema: StructType) -> dict:
    """One staged file's manifest entry, pyarrow-side, in the SAME
    JSON-portable min/max form ``_collect_file_stats`` produces — so
    sink-written files prune identically under merges and scans."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    stats = {}
    for c in VT._stats_cols(schema):
        if c not in t.column_names or t.num_rows == 0:
            continue
        mm = pc.min_max(t[c]).as_py()
        lo, hi = mm["min"], mm["max"]
        if isinstance(lo, dt.datetime):
            lo, hi = lo.replace(tzinfo=None), hi.replace(tzinfo=None)
        stats[c] = [VT._json_stat(lo), VT._json_stat(hi)]
    return {"path": path, "n_rows": t.num_rows, "stats": stats}


def _append_staged(conn: dict, messages, batch_id: int | None) -> None:
    """Driver-phase second half (sessionless): promote staged files
    into data/, stat them, and commit an incremental APPEND manifest —
    ledger-skipped on epoch replay, spin-retried on commit races
    (appends read nothing, so any race is disjoint by construction)."""
    table_dir = conn["path"]
    staged = [m.path for m in messages if m is not None and m.path]
    try:
        if not staged:
            return  # empty epoch: no commit
        if batch_id is not None and batch_id in VT.vt_committed_batch_ids(
            table_dir
        ):
            return  # replayed epoch: already appended
        schema = StructType.fromJson(json.loads(conn["schema_json"]))
        latest = VT.vt_latest_version(table_dir)
        VT._check_protocol(
            VT._read_manifest(table_dir, latest), table_dir, write=True
        )
        new_version = latest + 1
        token = uuid.uuid4().hex[:8]
        data_dir = os.path.join(
            table_dir, "data", f"v{new_version:05d}_{token}"
        )
        os.makedirs(data_dir, exist_ok=True)
        new_files = []
        for p in staged:
            dest = os.path.join(data_dir, os.path.basename(p))
            os.rename(p, dest)  # same filesystem: a move, not a copy
            new_files.append(_pa_file_stats(dest, schema))
        staged = []  # promoted: the finally-cleanup has nothing to do
        new_files.sort(key=lambda f: f["path"])
        for _spin in range(_APPEND_MAX_SPINS):
            parent_files = VT.vt_files(table_dir, latest)
            if parent_files is None:
                raise ValueError(
                    "vt_table sink needs a file-level manifest "
                    "(round-5+ table); rewrite the table (vt_optimize) "
                    "first — appending to an opaque-dir manifest would "
                    "drop its rows from the new version"
                )
            carried = list(parent_files)
            manifest = {
                "data_dir": data_dir,
                "n_rows": VT._live_rows(carried + new_files),
                "schema": conn["schema_json"] and json.loads(
                    conn["schema_json"]
                ),
                "operation": "APPEND",
                **VT._incremental_or_full(
                    new_version, parent_files, carried, new_files, []
                ),
            }
            if batch_id is not None:
                manifest["batch_id"] = int(batch_id)
            try:
                VT._commit(table_dir, new_version, manifest)
                return
            except VT.VersionConflictError:
                # re-check the epoch ledger AFTER every lost race: the
                # winner may have been a concurrent committer of this
                # SAME batchId (a zombie query racing its restarted
                # replacement — the scenario Delta's txn-version check
                # exists for); re-committing here would double-append
                # the epoch. The promoted files are unreferenced by any
                # manifest, so dropping the directory is safe.
                if batch_id is not None and batch_id in (
                    VT.vt_committed_batch_ids(table_dir)
                ):
                    shutil.rmtree(data_dir, ignore_errors=True)
                    return
                latest = VT.vt_latest_version(table_dir)
                new_version = latest + 1
        raise VT.VersionConflictError(
            f"vt_table append on {table_dir}: starved by "
            f"{_APPEND_MAX_SPINS} consecutive commit races"
        )
    finally:
        for p in staged:
            try:
                os.remove(p)
            except OSError:
                pass


def _abort_staged(messages) -> None:
    for m in messages or ():
        if m is not None and getattr(m, "path", None):
            try:
                os.remove(m.path)
            except OSError:
                pass


class VersionedTableWriter(DataSourceWriter):
    """Batch sink: ``df.write.format("vt_table").mode("append")`` —
    one APPEND version per save (no batch_id: batch writes carry no
    epoch identity; idempotence is the caller's)."""

    def __init__(self, conn: dict):
        self.conn = conn
        _ensure_table(conn)

    def write(self, iterator):
        return _stage_rows(self.conn, iterator)

    def commit(self, messages):
        _append_staged(self.conn, messages, None)

    def abort(self, messages):
        _abort_staged(messages)


class VersionedTableStreamWriter(DataSourceStreamWriter):
    """Streaming sink: one epoch = one ledgered APPEND version. A
    replayed epoch (restart after a crash between append and
    checkpoint advance) finds its batchId in the table's ledger and
    skips — exactly-once behind the standard sink API. Keyed MERGE
    stays on foreachBatch (``vt_foreach_batch_merger``) — the same
    split Delta's streaming sink makes, and for the same reason (the
    sink's commit phase has no SparkSession)."""

    def __init__(self, conn: dict):
        self.conn = conn
        _ensure_table(conn)

    def write(self, iterator):
        return _stage_rows(self.conn, iterator)

    def commit(self, messages, batchId):
        _append_staged(self.conn, messages, int(batchId))

    def abort(self, messages, batchId):
        _abort_staged(messages)


class VersionedTableDataSource(DataSource):
    """Options: path (table dir, required). Append-only by design —
    see the module docstring for the MERGE split."""

    @classmethod
    def name(cls):
        return "vt_table"

    def schema(self):
        raise ValueError(
            "vt_table is a sink; read versioned tables via vt_read or "
            "the vt_cdf source"
        )

    def writer(self, schema, overwrite):
        if overwrite:
            raise ValueError(
                "vt_table supports mode('append') only — overwrite "
                "semantics belong to vt_create/vt_restore"
            )
        return VersionedTableWriter(_conn(self.options, schema))

    def streamWriter(self, schema, overwrite):
        return VersionedTableStreamWriter(_conn(self.options, schema))


def register(spark) -> None:
    spark.dataSource.register(VersionedTableDataSource)
