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

from kinesis_app_spark.functions.text import word_shingles
from kinesis_app_spark.operators.dedup import banded_minhash
from kinesis_app_spark.operators.util import spread

_NUM_HASHES = 64
_BANDS = 16


def _prepared(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """(fingerprints, shingled) for a document frame."""
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("fp"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    )
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
    fps_b, sh_b = _prepared(batch, text_col, id_col, k)
    fps_c = spark.read.parquet(
        os.path.join(index_dir, "fingerprints.parquet")
    ).select(F.col("id").alias("cid"), F.col("fp"))
    exact = (
        fps_b.join(fps_c, "fp")
        .groupBy("id")
        .agg(F.min("cid").alias("dup_of"))
        .select("id", F.lit("exact_dup").alias("verdict"), "dup_of",
                F.lit(1.0).alias("jaccard"))
    )

    bands_c = spark.read.parquet(os.path.join(index_dir, "bands.parquet"))
    bands_b = banded_minhash(sh_b, num_hashes=_NUM_HASHES, bands=_BANDS)
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

    decided = exact.unionByName(
        near.join(exact.select("id"), "id", "left_anti")
    )
    fresh = fps_b.select("id").join(
        decided.select("id"), "id", "left_anti"
    ).select(
        "id",
        F.lit("new").alias("verdict"),
        F.lit(None).cast("long").alias("dup_of"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return decided.unionByName(fresh).withColumnRenamed("id", id_col)


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
