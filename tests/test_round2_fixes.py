"""Round-2 hardening tests: short-document shingle guards, the hot-shingle
document-frequency cap, quadratic-path size guards, salted_join join-type
restriction, assign() duplicate items, connected-components convergence,
and run_to_memory timeout behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.functions.text import rolling_hashes, word_shingles
from kinesis_app_spark.operators.dedup import (
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_np,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from kinesis_app_spark.operators.graph import connected_components
from kinesis_app_spark.operators.scale import salted_join
from kinesis_app_spark.operators.textanalysis import winnow_fingerprints
from kinesis_app_spark.sources.batch import load_table
from kinesis_app_spark.streaming.assign import assign
from kinesis_app_spark.streaming.ops import run_to_memory
from kinesis_app_spark.streaming.sources import file_stream

SF_DIR = "/root/testdata/sf0.001"


# ---------- short documents (ADVICE: sequence(1,0) -> [1,0] crash) ----------

def _short_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "hi"),                               # 1 token < k
            (2, "two tokens"),                       # 2 tokens < k=3
            (3, ""),                                  # empty
            (4, "the quick brown fox jumps over the lazy dog today"),
            (5, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, text string",
    )


def test_word_shingles_short_docs_empty_not_crash(spark):
    df = _short_corpus(spark)
    rows = {
        r["doc_id"]: (len(r["sh"]), len(r["rh"]))
        for r in df.select(
            "doc_id",
            word_shingles(F.col("text"), 3).alias("sh"),
            rolling_hashes(F.col("text"), 8).alias("rh"),
        ).collect()
    }
    assert rows[1] == (0, 0) and rows[2] == (0, 0) and rows[3] == (0, 0)
    assert rows[4][0] == 8 and rows[4][1] == 3  # 10 tokens: 8 3-shingles, 3 8-windows


def test_dedup_ops_survive_short_docs(spark):
    """minhash/ngram/simhash/winnowing must not abort on a corpus containing
    sub-k-token documents, and must still find the long near-dup pair."""
    df = _short_corpus(spark)
    ng = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in ng} == {(4, 5)}
    mh = minhash_lsh_pairs(df, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in mh} == {(4, 5)}
    # simhash: crash-freedom is the contract here (a 1-token-diff pair is
    # not guaranteed a shared band); short docs must not emit pairs
    sp = simhash_pairs(df).collect()
    assert {i for r in sp for i in (r["id_a"], r["id_b"])} <= {4, 5}
    assert winnow_fingerprints(df).filter("doc_id < 4").count() == 0


# ---------- hot-shingle document-frequency cap ----------

def test_ngram_cap_is_noop_on_fixture(spark):
    """With the cap above every real shingle's DF, results are bit-identical
    to the uncapped oracle twin."""
    docs = load_table(spark, SF_DIR, "documents")
    base = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    )
    capped = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=10_000).collect()
    )
    assert base == capped and len(base) > 0


def test_ngram_cap_drops_hot_shingle_keeps_pairs(spark):
    """A boilerplate phrase shared by every doc (the skew hole: D^2 join
    rows) is dropped by the cap; genuinely-similar pairs survive."""
    boiler = "all rights reserved worldwide"
    common = (
        "quick brown fox jumps over the lazy dog near the riverbank "
        "at dawn every single day"
    )
    rows = []
    # 10 distinct docs + 1 near-dup pair, all ending in the same boilerplate
    for i in range(10):
        rows.append((i, f"unique document number {i} about topic {i * 7} " + boiler))
    rows.append((100, f"dog {common} {boiler}"))
    rows.append((101, f"cat {common} {boiler}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # the capped (conservative) Jaccard for 100/101: only the first shingle
    # differs, two boilerplate shingles are dropped -> 16/22 = 0.727 >= 0.5
    capped = ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=5)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(100, 101)}
    # boilerplate postings really were excluded: with the cap, pairs held
    # together ONLY by stop-shingles vanish even at threshold ~0
    loose = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=5)
    pairs = {(r["id_a"], r["id_b"]) for r in loose.collect()}
    assert pairs == {(100, 101)}
    uncapped = ngram_jaccard_pairs(df, threshold=0.01)
    assert len({(r["id_a"], r["id_b"]) for r in uncapped.collect()}) > len(pairs)


# ---------- quadratic-path size guards ----------

def _vecs(spark, n=6):
    return spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_embedding_exact_guard_raises(spark):
    with pytest.raises(ValueError, match="lsh_bits>0"):
        embedding_near_dup_pairs(_vecs(spark), max_exact_rows=3).collect()
    with pytest.raises(ValueError, match="LSH-bucketed"):
        embedding_near_dup_pairs_np(_vecs(spark), max_exact_rows=3).collect()


def test_embedding_guard_passes_small_and_lsh_unguarded(spark):
    assert embedding_near_dup_pairs(_vecs(spark), threshold=0.99).count() >= 0
    # the LSH branch takes no exact-rows guard even with a tiny cap
    out = embedding_near_dup_pairs(
        _vecs(spark), threshold=0.99, lsh_bits=4, lsh_tables=4, max_exact_rows=3
    )
    assert out.count() >= 0


# ---------- salted_join join types ----------

def test_salted_join_rejects_right_and_full(spark):
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(a, b, on=["k"], how=how)


def test_salted_join_left_matches_plain_left(spark):
    a = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, v string"
    )
    b = spark.createDataFrame([(1, "x"), (2, "y"), (9, "z")], "k long, w string")
    got = sorted(
        tuple(r) for r in salted_join(a, b, on=["k"], how="left", salt_buckets=4)
        .select("k", "v", "w").collect()
    )
    want = sorted(tuple(r) for r in a.join(b, "k", "left").select("k", "v", "w").collect())
    assert got == want


# ---------- assign() with duplicate items ----------

def test_assign_duplicate_items_each_once():
    out = assign(["n1", "n2"], ["s1", "s2", "s1", "s1", "s3"])
    flat = [it for items in out.values() for it in items]
    assert sorted(flat) == ["s1", "s2", "s3"]
    assert max(len(v) for v in out.values()) - min(len(v) for v in out.values()) < 2


# ---------- connected components convergence ----------

def test_connected_components_nonconvergence_raises(spark):
    # a 12-node chain has diameter 11 > max_rounds=2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)


def test_connected_components_chain_converges(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    out = connected_components(edges, max_rounds=25)
    assert {r["component"] for r in out.collect()} == {0}


# ---------- run_to_memory timeout ----------

def test_run_to_memory_timeout_raises(spark, tmp_path):
    d = str(tmp_path / "in")
    ev = load_table(spark, SF_DIR, "events").limit(100)
    ev.coalesce(1).write.parquet(d)
    stream = file_stream(spark, d, ev.schema)
    with pytest.raises(TimeoutError):
        run_to_memory(
            stream.groupBy("event_type").count(),
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_mode="complete",
            timeout_s=0.001,
        )
