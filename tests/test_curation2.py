"""Round-2 curation wave: segment-level boilerplate dedup, duplicated-span
statistics, and per-source quota sampling — semantics on hand-built
fixtures (the corpus-level behavior is covered by the DuckDB oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.operators.curation import (
    duplicate_span_stats,
    segment_dedup,
    source_quota_sample,
)

BP = "one two three four five six seven eight"  # exactly one 8-token segment


def test_segment_dedup_drops_shared_segments(spark):
    df = spark.createDataFrame(
        [
            (1, BP + " unique alpha beta"),
            (2, BP + " different gamma delta"),
            (3, "totally original words only here today friends yes"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in segment_dedup(df).collect()}
    # the shared leading segment is dropped from both docs 1 and 2; the
    # distinct 3-token tails survive
    assert (rows[1]["n_segments"], rows[1]["n_dropped"]) == (2, 1)
    assert rows[1]["clean_text"] == "unique alpha beta"
    assert rows[2]["clean_text"] == "different gamma delta"
    # doc 3 is one full segment, unshared
    assert (rows[3]["n_dropped"], rows[3]["clean_text"].startswith("totally")) == (
        0,
        True,
    )


def test_segment_dedup_fully_boilerplate_doc_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, BP), (2, BP), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in segment_dedup(df).collect()}
    assert rows[1]["clean_text"] == "" and rows[1]["n_dropped"] == 1
    # empty text normalizes to a single '' token segment, shared only with
    # other empty docs — here unique, so it survives unchanged
    assert rows[3]["n_segments"] == 1 and rows[3]["n_dropped"] == 0


def test_duplicate_span_stats_merges_overlapping_grams(spark):
    # twelve shared tokens => 3 overlapping duplicated 10-grams per doc,
    # which must merge into ONE span of 12 tokens
    shared = "a b c d e f g h i j k l"
    df = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2 tail3"),
            (2, shared + " other4 other5 other6"),
            (3, "n o p q r s t u v w x y z aa bb"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_span_stats(df, ngram=10).collect()}
    assert (rows[1]["n_spans"], rows[1]["dup_tokens"], rows[1]["total_tokens"]) == (
        1,
        12,
        15,
    )
    assert rows[1]["dup_frac"] == 0.8
    assert (rows[3]["n_spans"], rows[3]["dup_tokens"]) == (0, 0)


def test_duplicate_span_stats_within_doc_repeat(spark):
    # the 10-gram repeats INSIDE one document: both occurrences are spans
    gram = "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10"
    df = spark.createDataFrame(
        [(1, gram + " mid1 mid2 mid3 " + gram)],
        "doc_id long, text string",
    )
    (row,) = duplicate_span_stats(df, ngram=10).collect()
    assert row["n_spans"] == 2 and row["dup_tokens"] == 20


def test_duplicate_span_stats_short_doc_no_crash(spark):
    df = spark.createDataFrame(
        [(1, "just three words"), (2, "just three words")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_span_stats(df, ngram=10).collect()}
    assert rows[1]["n_spans"] == 0 and rows[1]["total_tokens"] == 3


def test_source_quota_sample_caps_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)],
        "doc_id long, source string",
    ).withColumnRenamed("source", "source")
    out1 = source_quota_sample(df, cap=5, id_col="doc_id").collect()
    out2 = source_quota_sample(df, cap=5, id_col="doc_id").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_src = {}
    for r in out1:
        per_src.setdefault(r["source"], []).append(r["rk"])
    assert set(per_src) == {"s0", "s1", "s2"}
    for rks in per_src.values():
        assert sorted(rks) == [1, 2, 3, 4, 5]


def test_source_quota_sample_cap_above_size_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    assert source_quota_sample(df, cap=10).count() == 3
