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


def test_lsh_swap_in_matches_exact_pipeline(spark):
    """The use_lsh=True scale path must produce the identical curated set
    as the exact inverted-index path on the fixture (MinHash banding recall
    is 1.0 here — the same property the dedup_minhash_lsh oracle relies
    on)."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {r["doc_id"] for r in curate_corpus(docs, use_lsh=False).collect()}
    lsh = {r["doc_id"] for r in curate_corpus(docs, use_lsh=True).collect()}
    assert exact == lsh
    assert exact  # non-trivial corpus survived


def test_connected_components_hand_graph(spark):
    """Chain 1-2-3, isolated pair 10-11, triangle 20-21-22: labels converge
    to each component's minimum id."""
    from kinesis_app_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_curation_stats_funnel(spark):
    docs = load_table(spark, SF_DIR, "documents")
    survivors = curate_corpus(docs, min_quality=0.30, langs=("en",))
    row = curation_stats(survivors, docs).collect()[0]
    assert row["n_raw"] == docs.count()
    assert 0 < row["n_survivors"] <= row["n_raw"]
    assert 0.30 <= row["mean_quality"] <= 1.0
