"""Targeted operator unit tests (semantics on hand-built inputs, plus
cross-checks the DuckDB oracle can't express)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import functions as F

from kinesis_app_spark.operators.asof import asof_join
from kinesis_app_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from kinesis_app_spark.operators.multimodal import attach_payload, frame_sample
from kinesis_app_spark.operators.similarity import brute_force_topk, ivf_topk
from kinesis_app_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00:00"), 1),
         ("u1", _ts("2024-01-01T12:00:00"), 2),
         ("u2", _ts("2024-01-01T09:00:00"), 3)],
        "k string, lts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:30:00"), 100.0),
         ("u1", _ts("2024-01-01T11:00:00"), 200.0),
         ("u2", _ts("2024-01-01T09:00:00"), 300.0),   # equal ts: inclusive match
         ("u2", _ts("2024-01-01T10:00:00"), 400.0)],
        "k string, rts timestamp, rv double",
    )
    out = {
        r["lid"]: r["rv"]
        for r in asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    }
    assert out == {1: 100.0, 2: 200.0, 3: 300.0}


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01T08:00:00"), 1)], "k string, lts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:00:00"), 5.0)], "k string, rts timestamp, rv double"
    )
    rows = asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert len(rows) == 1 and rows[0]["rv"] is None


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00:00"), 1),
         ("u1", _ts("2024-01-01T12:00:00"), 2),
         ("u2", _ts("2024-01-01T09:00:00"), 3)],
        "k string, lts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:30:00"), 100.0),
         ("u1", _ts("2024-01-01T13:00:00"), 200.0),
         ("u2", _ts("2024-01-01T09:00:00"), 300.0)],   # equal ts: inclusive
        "k string, rts timestamp, rv double",
    )
    fwd = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            direction="forward",
        ).collect()
    }
    assert fwd == {1: 100.0, 2: 200.0, 3: 300.0}
    # backward with 1h tolerance: lid=2's only preceding right row (10:30)
    # is 1.5h stale -> nulled; lid=1 has no preceding row at all
    tol = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            tolerance="1 hour",
        ).collect()
    }
    assert tol == {1: None, 2: None, 3: 300.0}
    # forward with 30min tolerance: lid=1 matches (10:30 within 30min),
    # lid=2's next row (13:00) is 1h out -> nulled
    ftol = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            direction="forward", tolerance="30 minutes",
        ).collect()
    }
    assert ftol == {1: 100.0, 2: None, 3: 300.0}


def test_minhash_candidates_superset_of_exact(spark):
    """LSH must not miss: at these parameters, every exact-Jaccard>=0.5
    pair on the fixture docs is also an LSH-verified pair."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact  # fixture contains near-duplicate clusters
    assert exact <= lsh or exact == lsh


def test_simhash_identical_texts_collide(spark):
    df = spark.createDataFrame(
        [(1, "spark window query batch row value"),
         (2, "spark window query batch row value"),
         (3, "utterly different content entirely dissimilar tokens xyz")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ivf_recall_against_brute_force(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_kmeans_refinement_keeps_or_improves_recall(spark):
    """One Lloyd pass on the seed centroids must not hurt recall (and the
    centroid count must be preserved, emptied cells included)."""
    from kinesis_app_spark.operators.similarity import kmeans_refine
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(refine):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, k=5, n_centroids=16, nprobe=8,
                refine_iterations=refine,
            ).collect()
        }
        return len(exact & approx) / len(exact)

    seeds = (
        emb.orderBy("vec_id").limit(16)
        .select(
            FF.row_number().over(Window.orderBy("vec_id")).alias("cell"),
            FF.col("embedding").alias("centv"),
        )
    )
    refined = kmeans_refine(emb, seeds, iterations=1)
    assert refined.count() == 16
    r0, r1 = recall(0), recall(1)
    assert r1 >= r0 - 0.15, f"refinement degraded recall: {r0} -> {r1}"


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-check the as-of operator against pandas merge_asof (the
    semantics standard) on seeded random data."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l).astype("int64"),
            "lts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r).astype("int64"),
            "rts": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
            "rv": rng.normal(size=n_r),
        }
    )
    # merge_asof requires unique, sorted ts per key for exact comparison;
    # drop duplicate (k, ts) rows so "most recent" is unambiguous
    right = right.drop_duplicates(["k", "rts"])
    want = pd.merge_asof(
        left.sort_values("lts"),
        right.sort_values("rts").rename(columns={"rts": "lts"}),
        on="lts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).set_index("lid")["rv"]

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="lts",
        right_ts="rts",
        value_cols=["rv"],
    ).toPandas().set_index("lid")["rv"]

    assert len(out) == n_l
    for lid in want.index:
        a, b = want[lid], out[lid]
        assert (pd.isna(a) and pd.isna(b)) or a == b, (lid, a, b)


def test_embedding_lsh_bucketed_recall(spark):
    """The hyperplane-LSH-bucketed variant must (a) return a subset of the
    exact pairs (it only prunes, never invents: cosine is still verified
    per candidate) and (b) retain reasonable recall at few bits."""
    from kinesis_app_spark.operators.dedup import embedding_near_dup_pairs

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.4, lsh_bits=4, lsh_tables=8
        ).collect()
    }
    assert bucketed <= exact
    assert exact
    recall = len(bucketed) / len(exact)
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_embedding_near_dup_np_matches_exact(spark):
    """The BLAS variant must find exactly the same above-threshold pairs as
    the Column-algebra exact variant."""
    from kinesis_app_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_np,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs_np(emb, threshold=0.4).collect()
    }
    assert exact == fast
    assert exact  # fixture has near-dup pairs


def test_frame_sample_shape(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    frames = frame_sample(attach_payload(docs), every_n_bytes=64)
    pdf = frames.toPandas()
    # one row per 64-byte offset, offsets multiples of 64, bytes in range
    assert (pdf["frame_offset"] % 64 == 0).all()
    assert pdf["first_byte"].between(0, 255).all()
    n_docs = docs.count()
    assert pdf["doc_id"].nunique() == n_docs


def test_media_codec_roundtrip():
    """Pure codec check: spec-valid PNG/WAV synthesis parses back exactly;
    corrupt or truncated bytes degrade to all-None, never raise."""
    from kinesis_app_spark.operators.multimodal import (
        parse_media, png_bytes, wav_bytes,
    )

    p = parse_media(png_bytes(33, 17, seed=4))
    assert (p["modality"], p["width"], p["height"], p["bit_depth"]) == ("png", 33, 17, 8)
    w = parse_media(wav_bytes(16000, 2, 123, seed=9))
    assert (w["modality"], w["channels"], w["sample_rate"], w["n_frames"], w["bit_depth"]) == (
        "wav", 2, 16000, 123, 16,
    )
    assert parse_media(b"not media at all")["modality"] is None
    assert parse_media(png_bytes(5, 5)[:20])["width"] is None


def test_media_decode_spark_roundtrip(spark):
    """synthesize_media -> decode_media_meta recovers the id-derived header
    fields from the raw bytes (decoder dispatches on magic number only)."""
    from kinesis_app_spark.operators.multimodal import (
        decode_media_meta, synthesize_media,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    out = decode_media_meta(synthesize_media(docs)).toPandas()
    assert len(out) == 20
    for r in out.itertuples():
        if r.doc_id % 2 == 0:
            assert r.modality == "png"
            assert r.width == 1 + r.doc_id % 64
            assert r.height == 1 + r.doc_id % 48
            assert pd.isna(r.sample_rate)
        else:
            assert r.modality == "wav"
            assert r.sample_rate == 8000 * (1 + r.doc_id % 3)
            assert r.channels == 1 + (r.doc_id // 2) % 2
            assert r.n_frames == 50 + r.doc_id % 200
            assert pd.isna(r.width)


def test_broadcast_join_plan_has_no_shuffle_on_big_side(spark, engine):
    """Plan-shape assertion: joining lineitem to broadcast(nation-sized dim)
    must use BroadcastHashJoin, not SortMergeJoin."""
    l = engine.table("lineitem")
    n = engine.table("supplier")
    plan = l.join(F.broadcast(n), l.l_suppkey == n.s_suppkey)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_let_bound_equals_inline_expression(spark):
    """let_bound must be a pure evaluation-strategy change: word_shingles
    (let-bound tokenizer) must produce exactly the inline-expression result."""
    from kinesis_app_spark.functions.text import let_bound, tokens, word_shingles

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    k = 3
    toks = tokens(F.col("text"))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    inline = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )
    got = docs.select(
        "doc_id",
        word_shingles(F.col("text"), k).alias("fast"),
        inline.alias("slow"),
        let_bound(F.lit(7), lambda x: x + x).alias("fourteen"),
    ).collect()
    for r in got:
        assert r["fast"] == r["slow"], r["doc_id"]
        assert r["fourteen"] == 14


def test_pq_recall_at_compression_params(spark):
    """PQ with compression-realistic parameters (m=16 -> 16 bytes/vector
    vs 256 for the raw float32s) must keep useful recall; the isotropic
    test embeddings are PQ's worst case, so the bar is recall >= 0.5."""
    from kinesis_app_spark.operators.similarity import pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, k=5, m=16, n_codes=16, rerank_factor=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"PQ recall too low: {recall}"


def test_pq_rejects_indivisible_subspaces(spark):
    import pytest
    from kinesis_app_spark.operators.similarity import pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    with pytest.raises(ValueError):
        pq_topk(emb, queries, k=5, m=7)


def test_png_patch_stats_decodes_and_skips_corrupt(spark):
    from kinesis_app_spark.operators.multimodal import png_bytes, png_patch_stats

    good = png_bytes(10, 5, seed=3)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"not a png at all")),
        (3, bytearray(good[:20])),  # truncated: valid magic, broken body
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = png_patch_stats(df).collect()
    # only doc 1 decodes: 10x5 -> 2 patches wide, 1 tall
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 2
    by_px = {r["px"]: r for r in out}
    assert by_px[0]["n_px"] == 40 and by_px[1]["n_px"] == 10
    # exact pixel math: sum of (3+x+y)%256 over the patch
    assert by_px[0]["pixel_sum"] == sum(
        (3 + x + y) % 256 for x in range(8) for y in range(5)
    )


def test_wav_window_energy_decodes_and_skips_corrupt(spark):
    from kinesis_app_spark.operators.multimodal import wav_bytes, wav_window_energy

    good = wav_bytes(8000, 2, 120, seed=5)  # stereo: first channel taken
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"RIFFxxxxJUNK"))],
        "doc_id long, payload binary",
    )
    out = {r["win"]: r for r in wav_window_energy(df).collect()}
    assert len(out) == 3  # 120 frames -> 50/50/20
    assert out[2]["n_frames"] == 20
    samples = [((5 * 31 + i * 7) % 65536) - 32768 for i in range(120)]
    assert out[0]["sample_sum"] == sum(samples[:50])
    assert out[0]["energy"] == sum(s * s for s in samples[:50])
