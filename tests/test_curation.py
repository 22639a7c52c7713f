"""Curation operators: PII scan/redaction, contamination, unigram LM,
radius search — semantics plus the plan shapes the 100 TB story claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.operators.curation import (
    contamination_pairs,
    pii_scan,
    unigram_logprob_scores,
)
from kinesis_app_spark.operators.similarity import radius_neighbors
from kinesis_app_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_pii_scan_detects_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@site.org or call 555-123-4567 today"),
            (2, "card 1234 5678 9012 3456 ssn 123-45-6789 ip 10.0.0.1"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"]) == (1, 1)
    assert rows[1]["redacted"] == "mail me at [EMAIL] or call [PHONE] today"
    assert (rows[2]["n_ccn"], rows[2]["n_ssn"], rows[2]["n_ipv4"]) == (1, 1, 1)
    assert rows[2]["redacted"] == "card [CCN] ssn [SSN] ip [IPV4]"
    assert rows[2]["pii_total"] == 3 and rows[2]["has_pii"]
    assert rows[3]["pii_total"] == 0 and not rows[3]["has_pii"]
    # digits that are none of the patterns survive redaction untouched
    extra = pii_scan(
        spark.createDataFrame([(4, "version 1.2 build 20240101")], "doc_id long, text string")
    ).collect()[0]
    assert extra["pii_total"] == 0
    assert extra["redacted"] == "version 1.2 build 20240101"


def test_pii_scan_is_pure_projection(spark):
    """The PII operator must add no Exchange: it is a per-row map."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = pii_scan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_contamination_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon eta"),  # 3 shared 3-shingles
            (2, "alpha beta gamma nope nope nope"),     # only 1 shared
            (3, "totally unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["train_id"], r["bench_id"]): r["n_shared"]
        for r in contamination_pairs(train, bench, min_shared=3).collect()
    }
    assert got == {(1, 100): 3}


def test_contamination_broadcasts_bench_side(spark):
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    train = docs.filter(F.col("doc_id") % 101 != 0)
    plan = (
        contamination_pairs(train, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unigram_logprob_orders_common_above_rare(spark):
    """A doc of corpus-frequent tokens must outscore a doc of hapaxes."""
    df = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "the the the the"),
            (3, "qzx wvu jkl mnb"),
        ],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    assert scores[1]["n_tokens"] == 4
    assert scores[1]["logprob"] > scores[3]["logprob"]


def test_winsorize_clips_to_quantiles(spark):
    from kinesis_app_spark.operators.curation import winsorize

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("a", 1e9), ("a", -1e9)],
        "g string, value double",
    )
    out = winsorize(df, "value", ["g"], 0.05, 0.95).collect()
    vals = [r["value_wins"] for r in out]
    # extremes clipped into the quantile range, interior values untouched
    assert max(vals) < 1e9 and min(vals) > -1e9
    inner = {r["value"]: r["value_wins"] for r in out if 20 <= r["value"] <= 80}
    assert all(v == w for v, w in inner.items())
    # broadcast join back, no shuffle of the row stream
    plan = (
        winsorize(df, "value", ["g"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_gates(spark):
    """Exact duplicate of the corpus -> rejected; near-dup (J>=0.5) ->
    rejected; genuinely new -> admitted."""
    from kinesis_app_spark.operators.dedup import incremental_dedup

    existing = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different corpus content lives here today"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "The  quick brown fox jumps over the lazy dog"),  # exact (normalized)
            (11, "the quick brown fox jumps over the lazy cat"),   # near-dup
            (12, "entirely novel text about spark query engines"),  # admitted
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, existing, threshold=0.5).collect()
    )
    assert got == [12]


def test_radius_neighbors_matches_threshold_filter(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    got = radius_neighbors(emb, queries, threshold=0.25)
    # every returned cos clears the threshold, no self-matches
    rows = got.collect()
    assert rows
    assert all(r["cos"] >= 0.25 and r["neighbor_id"] != r["query_id"] for r in rows)
    # no sort/top-k machinery in the plan: scan + broadcast join + filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrdered" not in plan and "Sort" not in plan
