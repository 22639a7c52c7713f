"""Properties of the end-to-end curation pipeline that the value-hash
oracle doesn't directly express."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.operators.dedup import ngram_jaccard_pairs
from kinesis_app_spark.operators.pipeline import curate_corpus, curation_stats
from kinesis_app_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_survivors_have_no_near_dup_pairs(spark):
    """Closure: re-running near-dup detection on the curated output finds
    nothing above the threshold."""
    docs = load_table(spark, SF_DIR, "documents")
    survivors = curate_corpus(docs, min_quality=0.30, langs=("en",))
    surv_docs = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    leftover = ngram_jaccard_pairs(surv_docs, threshold=0.5).count()
    assert leftover == 0


def test_survivors_respect_gates(spark):
    docs = load_table(spark, SF_DIR, "documents")
    survivors = curate_corpus(docs, min_quality=0.30, langs=("en",))
    bad = survivors.filter(
        (F.col("quality") < 0.30) | (F.col("pred_lang") != "en")
    ).count()
    assert bad == 0


def test_curation_stats_funnel(spark):
    docs = load_table(spark, SF_DIR, "documents")
    survivors = curate_corpus(docs, min_quality=0.30, langs=("en",))
    row = curation_stats(survivors, docs).collect()[0]
    assert row["n_raw"] == docs.count()
    assert 0 < row["n_survivors"] <= row["n_raw"]
    assert 0.30 <= row["mean_quality"] <= 1.0
