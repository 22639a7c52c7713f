"""Persistent near-duplicate index: build once over the accepted corpus,
screen every incoming batch against it, append what survives.

The fused dedup operators (operators/dedup.py) recompute the corpus
side's shingles and signatures inside every run; production ingestion
dedups a DAILY BATCH against an ever-growing accepted corpus, and
recomputing the corpus side daily is the cost that kills that loop at
100 TB. This module persists exactly what the screen needs:

  fingerprints.parquet  (doc_id, fp)                exact-dup probe
  bands.parquet         (band_idx, band_hash, doc_id) LSH candidates
  shingles.parquet      (doc_id, shingles)          exact-Jaccard verify

Screening a batch costs: batch-side shingle/signature computation, one
equi-join per probe against the stored tables (fingerprints and bands
join on hashes — 8-byte keys, never text), and an exact verify that
touches ONLY candidate corpus docs' stored shingle sets. The corpus
text is never read again. ``add`` appends the accepted docs' rows —
the ivf_append discipline for text dedup.

Storage note: the shingle table is the verify cost (a bounded-factor
blowup of the text); the alternative — re-reading corpus text at
verify time — trades storage for a random-access text fetch per
candidate. Real systems persist signatures/shingles for exactly this
reason; with banding recall ~1 at the target threshold the verify set
is small.

Decisions are exact-Jaccard-verified, so the screen's verdicts equal
the exact posting-join semantics whenever banding recall is 1.0 (the
dedup_minhash_lsh gate discipline) — which is what lets a DuckDB
oracle replay the whole screen arithmetically.

Engine surface per SURVEY.md §2.2 north-star dedup (the reference has
no text operators at all, src/Kinesis/Coordination.hs:51-53).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_app_spark.pinning import pin

from kinesis_app_spark.functions.text import word_shingles
from kinesis_app_spark.operators.dedup import banded_minhash
from kinesis_app_spark.operators.util import spread

_NUM_HASHES = 64
_BANDS = 16


def _prepared(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """(fingerprints, shingled) for a document frame.

    The md5 + shingling fold is the expensive per-doc pass; both outputs
    (and every downstream probe) share it, so pin it — otherwise each
    consumer re-runs the fold over the text (screen: 4 consumers via
    fps/sh; build/add: 3 writes).
    """
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("fp"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).transform(pin, eager=False)
    fps = base.select("id", "fp")
    sh = base.filter(F.size("shingles") > 0).select("id", "shingles")
    return fps, sh


def dedup_index_build(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> None:
    """Build the index over the accepted corpus (one corpus scan)."""
    fps, sh = _prepared(docs, text_col, id_col, k)
    fps.write.mode("overwrite").parquet(
        os.path.join(index_dir, "fingerprints.parquet")
    )
    sh.write.mode("overwrite").parquet(
        os.path.join(index_dir, "shingles.parquet")
    )
    banded_minhash(sh, num_hashes=_NUM_HASHES, bands=_BANDS).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "bands.parquet"))


def _screen_core(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    k: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The screen pipeline, also returning the pinned batch-side frames
    (verdicts, fps_b, sh_b, bands_b) so a combined screen+add can
    append the accepted docs' rows by FILTERING them instead of
    re-folding the text and re-hashing the signatures."""
    fps_b, sh_b = _prepared(batch, text_col, id_col, k)
    fps_c = spark.read.parquet(
        os.path.join(index_dir, "fingerprints.parquet")
    ).select(F.col("id").alias("cid"), F.col("fp"))
    # pinned: consumed twice (decided union + the near left_anti), and
    # its tree re-runs the fp probe join per consumer otherwise
    exact = (
        fps_b.join(fps_c, "fp")
        .groupBy("id")
        .agg(F.min("cid").alias("dup_of"))
        .select("id", F.lit("exact_dup").alias("verdict"), "dup_of",
                F.lit(1.0).alias("jaccard"))
        .transform(pin, eager=False)
    )

    bands_c = spark.read.parquet(os.path.join(index_dir, "bands.parquet"))
    # pinned: one consumer here (candidate probe), a second in the
    # combined screen+add path (the accepted docs' band append)
    bands_b = banded_minhash(
        sh_b, num_hashes=_NUM_HASHES, bands=_BANDS
    ).transform(pin, eager=False)
    cand = (
        bands_b.join(
            bands_c.select(
                F.col("band_idx"),
                F.col("band_hash"),
                F.col("id").alias("cid"),
            ),
            ["band_idx", "band_hash"],
        )
        .select("id", "cid")
        .distinct()
    )
    sh_c = spark.read.parquet(
        os.path.join(index_dir, "shingles.parquet")
    ).select(F.col("id").alias("cid"), F.col("shingles").alias("sh_c"))
    verified = (
        cand.join(sh_b.select("id", F.col("shingles").alias("sh_b")), "id")
        .join(sh_c, "cid")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_b", "sh_c"))
            / F.size(F.array_union("sh_b", "sh_c")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("id").orderBy(F.desc("jaccard"), F.asc("cid"))
    near = (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "id",
            F.lit("near_dup").alias("verdict"),
            F.col("cid").alias("dup_of"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )

    # pinned: consumed twice (result union + the fresh left_anti); the
    # tree behind it is the whole band-probe + exact-verify pipeline
    decided = exact.unionByName(
        near.join(exact.select("id"), "id", "left_anti")
    ).transform(pin, eager=False)
    fresh = fps_b.select("id").join(
        decided.select("id"), "id", "left_anti"
    ).select(
        "id",
        F.lit("new").alias("verdict"),
        F.lit(None).cast("long").alias("dup_of"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return decided.unionByName(fresh), fps_b, sh_b, bands_b


def dedup_index_screen(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Screen a batch against the index: one verdict row per batch doc.

    Returns (doc_id, verdict, dup_of, jaccard):
      exact_dup  fp matches a stored fingerprint; dup_of = lowest such
                 corpus doc, jaccard = 1.0
      near_dup   banded candidate whose exact Jaccard vs the STORED
                 shingle set >= threshold; dup_of = the best match
                 (max jaccard, then lowest corpus id)
      new        neither — safe to accept (and to ``dedup_index_add``)

    Join shapes: fp and band probes are hash-keyed equi-joins; the
    exact verify joins candidates to stored shingles only. Verdict
    precedence exact > near > new is deterministic, so the whole screen
    is value-gateable.
    """
    out, _fps, _sh, _bands = _screen_core(
        spark, index_dir, batch, threshold, text_col, id_col, k
    )
    return out.withColumnRenamed("id", id_col)


def dedup_index_screen_and_add(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Screen a batch AND append its 'new' docs in one pass — the
    ingestion-loop fusion of ``dedup_index_screen`` +
    ``dedup_index_add``: the accepted docs' fingerprint/shingle/band
    rows are FILTERED from the screen's pinned batch-side frames
    instead of re-folding the text and re-hashing the signatures
    (``banded_minhash`` is per-doc deterministic, so filtering its
    output to the accepted ids equals recomputing it on the accepted
    subset — identical appended rows, one fold and one banding pass
    per epoch instead of two of each). Verdicts are eagerly pinned
    BEFORE the appends mutate the index. Returns the verdicts frame
    (same contract as ``dedup_index_screen``)."""
    out, fps_b, sh_b, bands_b = _screen_core(
        spark, index_dir, batch, threshold, text_col, id_col, k
    )
    verdicts = out.localCheckpoint()  # eager: pre-mutation snapshot
    # GATED broadcast (advice r8): an early epoch can be ~100% 'new',
    # so the accepted-id set is unbounded — an unconditional broadcast
    # hint bypasses autoBroadcastJoinThreshold and can OOM the driver
    # at batch scale. The verdicts are already materialized, so the id
    # count is a cheap cached-block scan; hint only when the set is
    # provably small (~8 bytes/id -> well under any broadcast limit),
    # else let the planner/AQE choose. (Dropping the hint outright
    # regressed the streaming ingest entry ~18%: the planner has no
    # stats for the checkpointed side and picked shuffles.)
    new_ids = verdicts.filter(F.col("verdict") == "new").select("id")
    if new_ids.count() <= 2_000_000:
        new_ids = F.broadcast(new_ids)
    fps_b.join(new_ids, "id", "left_semi").write.mode(
        "append"
    ).parquet(os.path.join(index_dir, "fingerprints.parquet"))
    sh_b.join(new_ids, "id", "left_semi").write.mode(
        "append"
    ).parquet(os.path.join(index_dir, "shingles.parquet"))
    bands_b.join(new_ids, "id", "left_semi").write.mode(
        "append"
    ).parquet(os.path.join(index_dir, "bands.parquet"))
    return verdicts.withColumnRenamed("id", id_col)


def dedup_index_add(
    spark: SparkSession,
    index_dir: str,
    accepted: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> None:
    """Append accepted docs to the index (incremental maintenance):
    their fingerprints, shingles, and band signatures — future batches
    then dedup against them too. Parquet append; no existing file is
    touched."""
    fps, sh = _prepared(accepted, text_col, id_col, k)
    fps.write.mode("append").parquet(
        os.path.join(index_dir, "fingerprints.parquet")
    )
    sh.write.mode("append").parquet(
        os.path.join(index_dir, "shingles.parquet")
    )
    banded_minhash(sh, num_hashes=_NUM_HASHES, bands=_BANDS).write.mode(
        "append"
    ).parquet(os.path.join(index_dir, "bands.parquet"))


#: the index's physical tables and the key each is probed/clustered on
_TABLES = {
    "fingerprints.parquet": ["fp"],
    "shingles.parquet": ["id"],
    "bands.parquet": ["band_idx", "band_hash"],
}


def _n_parquet_files(table_dir: str) -> int:
    return sum(
        1
        for _root, _dirs, names in os.walk(table_dir)
        for n in names
        if n.endswith(".parquet")
    )


def _rewrite_swap(
    df: DataFrame, table_dir: str, max_records_per_file: int | None = None
) -> None:
    """Materialize ``df`` (which reads FROM ``table_dir``) into a fresh
    directory, then swap it in. Single-writer maintenance discipline
    (the vt_vacuum contract): reads racing the two renames can fail and
    retry; a crash between them is recovered by moving ``.compact``
    back by hand — acceptable for an offline maintenance job, and the
    index data itself is never in a partial state (the new directory is
    complete before the first rename)."""
    import shutil

    tmp = table_dir + ".compact"
    trash = table_dir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    w = df.write
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(tmp)  # executes the read of table_dir -> complete copy
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(table_dir, trash)
    os.rename(tmp, table_dir)
    shutil.rmtree(trash, ignore_errors=True)


def dedup_index_optimize(
    spark: SparkSession,
    index_dir: str,
    max_records_per_file: int = 1 << 20,
) -> dict[str, tuple[int, int]]:
    """Compact the index tables: the screen->add ingestion loop appends
    one small file set per micro-batch, and at production cadence
    (thousands of epochs) the probe joins pay one file-open per tiny
    file — the classic small-file death of exactly this architecture.
    Each table is rewritten range-clustered on its probe key
    (fingerprints by fp, shingles by doc id, bands by band hash), so
    compaction also buys parquet footer min/max skipping on the keys
    every screen joins on — the engine's parquet_compaction_orders
    discipline applied to the index. Screen verdicts are bit-identical
    before and after (same rows, different file layout) — pinned in
    tests/test_round5.py. Returns {table: (files_before, files_after)}.
    """
    out = {}
    for name, keys in _TABLES.items():
        tdir = os.path.join(index_dir, name)
        before = _n_parquet_files(tdir)
        df = spark.read.parquet(tdir)
        clustered = df.repartitionByRange(
            *[F.col(c) for c in keys]
        ).sortWithinPartitions(*[F.col(c) for c in keys])
        _rewrite_swap(clustered, tdir, max_records_per_file)
        out[name] = (before, _n_parquet_files(tdir))
    return out


#: per-call erasure sets above this many distinct ids skip the
#: file-targeted path (driver collect bounded by construction) and fall
#: back to the full anti-join rewrite
_ERASE_MAX_IDS = 1_000_000


def _file_id_range_hits(sorted_ids: list, mn, mx) -> bool:
    """Does some erased id land inside this file's [min,max] id range?
    Missing stats mean 'possibly' (conservative)."""
    import bisect

    if mn is None or mx is None:
        return True
    i = bisect.bisect_left(sorted_ids, mn)
    return i < len(sorted_ids) and sorted_ids[i] <= mx


def _partial_rewrite_swap(
    kept: DataFrame, table_dir: str, untouched_paths: list[str]
) -> None:
    """_rewrite_swap for a FILE SUBSET: ``kept`` (the touched files'
    surviving rows) is materialized into the fresh directory, the
    untouched files are carried in as hardlinks (byte-identical,
    metadata-only cost — part-file names are uuid-unique so links never
    collide), and the directory is swapped with the same two-rename
    discipline. Write cost is O(touched files), not O(index)."""
    import shutil

    tmp = table_dir + ".compact"
    trash = table_dir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    kept.write.parquet(tmp)  # executes the read of the touched files
    for p in untouched_paths:
        dst = os.path.join(tmp, os.path.basename(p))
        try:
            os.link(p, dst)
        except OSError:  # cross-device / no-hardlink filesystem
            shutil.copy2(p, dst)
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(table_dir, trash)
    os.rename(tmp, table_dir)
    shutil.rmtree(trash, ignore_errors=True)


def _local_path(p: str) -> str:
    """_metadata.file_path URIs ("file:///x") to plain local paths."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


def dedup_index_remove(
    spark: SparkSession,
    index_dir: str,
    removed: DataFrame,
    id_col: str = "doc_id",
) -> int:
    """Deletion propagation (the GDPR-erasure path into the persisted
    index): drop the given doc ids from fingerprints, shingles, AND
    bands, so no future screen can name an erased doc as ``dup_of`` —
    erasure from the fact tables alone is incomplete while the index
    still references the doc.

    FILE-TARGETED (round 6): each table's per-file id min/max (one
    column-pruned ``_metadata.file_path`` agg) is tested against the
    collected erasure set, and only files that can hold an erased id
    are rewritten through the broadcast anti-join — untouched files are
    carried forward byte-identical (hardlinks into the swapped
    directory). After ``dedup_index_optimize`` the shingle table is
    range-clustered on id, so a k-id erasure rewrites a strict file
    subset there (pinned in tests/test_round6.py); fingerprints/bands
    cluster on their probe keys, so their per-file id ranges are wide
    and pruning helps only when ids correlate with layout — but the
    carry-forward never costs more than the old full rewrite. Erasure
    sets beyond ``_ERASE_MAX_IDS`` distinct ids fall back to the full
    rewrite (the driver collect is bounded by construction). Returns
    the number of indexed docs actually removed."""
    ids = removed.select(F.col(id_col).alias("id")).distinct()
    n_removed = (
        spark.read.parquet(os.path.join(index_dir, "fingerprints.parquet"))
        .join(F.broadcast(ids), "id", "left_semi")
        .count()
    )
    if n_removed == 0:
        return 0
    id_rows = ids.limit(_ERASE_MAX_IDS + 1).collect()
    sorted_ids = (
        sorted(r["id"] for r in id_rows if r["id"] is not None)
        if len(id_rows) <= _ERASE_MAX_IDS
        else None
    )
    for name in _TABLES:
        tdir = os.path.join(index_dir, name)
        df = spark.read.parquet(tdir)
        if sorted_ids is None:
            _rewrite_swap(df.join(F.broadcast(ids), "id", "left_anti"), tdir)
            continue
        stats = (
            df.groupBy(F.col("_metadata.file_path").alias("__p"))
            .agg(F.min("id").alias("__mn"), F.max("id").alias("__mx"))
            .collect()
        )  # bounded: one row per index file
        touched, untouched = [], []
        for r in stats:
            p = _local_path(r["__p"])
            if _file_id_range_hits(sorted_ids, r["__mn"], r["__mx"]):
                touched.append(p)
            else:
                untouched.append(p)
        if not touched:
            continue  # no file can hold an erased id: metadata-only
        kept = spark.read.parquet(*touched).join(
            F.broadcast(ids), "id", "left_anti"
        )
        _partial_rewrite_swap(kept, tdir, untouched)
    return int(n_removed)
