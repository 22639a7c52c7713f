"""Registry: hybrid retrieval — reciprocal-rank fusion of a lexical ranking
(n-gram Jaccard against the query document) and a vector ranking (embedding
cosine), the standard sparse+dense stack of an LLM retrieval pipeline.

Both sides are compositions of oracle-proven machinery (the shingle
inverted index and the exact cosine), so the fused ranking is fully
value-checkable in DuckDB. vec_id is 1:1 with doc_id in the test tables.

Scale shape: the query set is tiny and broadcast on BOTH sides — the
corpus is scanned once per side, shuffled only as (query, candidate,
score) rows; ranks are per-query windows over candidate-sized (not
corpus-sized) partitions; fusion is a full outer join of two top-20
lists (60 rows per query ceiling).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.functions.text import word_shingles
from kinesis_app_spark.functions.vector import cosine_similarity
from kinesis_app_spark.operators.util import spread
from kinesis_app_spark.registry_util import QuerySpec, table as _t

_N_QUERIES = 3   # doc_ids 0..2 play the query set
_SIDE_K = 20     # per-side candidate depth
_RRF_K = 60      # standard RRF constant
_TOP = 10


def hybrid_rrf_search(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    # ---- lexical side: Jaccard(query shingles, doc shingles), top-20 ----
    sh = spread(docs).select(
        "doc_id", word_shingles(F.col("text"), 3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    post = sh.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    q_post = post.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.col("n_sh").alias("q_sh"),
        "shingle",
    )
    jac = (
        post.filter(F.col("doc_id") >= _N_QUERIES)
        .join(F.broadcast(q_post), "shingle")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.max("n_sh").alias("n_d"),
            F.max("q_sh").alias("n_q"),
        )
        .withColumn(
            "jac",
            F.round(
                F.col("n_inter")
                / (F.col("n_d") + F.col("n_q") - F.col("n_inter")),
                4,
            ),
        )
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.desc("jac"), F.asc("doc_id")
    )
    lex = (
        jac.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= _SIDE_K)
        .select("query_id", "doc_id", "lex_rank")
    )

    # ---- vector side: exact cosine, top-20 ----
    q_vec = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        spread(emb)
        .filter(F.col("vec_id") >= _N_QUERIES)
        .select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("cv"))
        .crossJoin(F.broadcast(q_vec))
        .withColumn("cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6))
    )
    w_vec = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    vec = (
        scored.withColumn("vec_rank", F.row_number().over(w_vec))
        .filter(F.col("vec_rank") <= _SIDE_K)
        .select("query_id", "doc_id", "vec_rank")
    )

    # ---- reciprocal-rank fusion ----
    fused = (
        lex.join(vec, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0)),
                6,
            ),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= _TOP)
        .select(
            "query_id", "doc_id", "rrf", F.col("rank").cast("int").alias("rank")
        )
    )


HYBRID_RRF_SQL = f"""
WITH norm AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS shingles
  FROM norm WHERE len(toks) >= 3
), post AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
), jac AS (
  SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
         round(count(*) / (max(d.n_sh) + max(q.n_sh) - count(*)), 4) AS jac
  FROM (SELECT * FROM post WHERE doc_id >= {_N_QUERIES}) d
  JOIN (SELECT * FROM post WHERE doc_id < {_N_QUERIES}) q ON d.shingle = q.shingle
  GROUP BY 1, 2
), lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY jac DESC, doc_id) AS lex_rank
  FROM jac QUALIFY lex_rank <= {_SIDE_K}
), cosd AS (
  SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
         round(list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos
  FROM (SELECT * FROM embeddings WHERE vec_id >= {_N_QUERIES}) d,
       (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
), vec AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS vec_rank
  FROM cosd QUALIFY vec_rank <= {_SIDE_K}
), fused AS (
  SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
         coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         round(coalesce(1.0 / ({_RRF_K} + lex_rank), 0)
             + coalesce(1.0 / ({_RRF_K} + vec_rank), 0), 6) AS rrf
  FROM lex FULL JOIN vec USING (query_id, doc_id)
)
SELECT query_id, doc_id, rrf,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank
FROM fused QUALIFY rank <= {_TOP}
"""


def retrieval_eval_metrics(spark, sf_dir):
    """Retrieval EVALUATION harness: recall@10, reciprocal rank, and
    nDCG@10 per query, with ground-truth relevance = label match (the
    standard eval loop for an embedding model / ANN index). Rides the
    oracle-proven exact-KNN ranking (cos rounded to 6 before ranking,
    vec_id tie-break); ideal DCG folds over a sequence literal, so the
    only float surface is log2 on small integers, rounded to 4.

    Scale: query set broadcast, corpus scanned once (the KNN shape);
    per-label totals are a broadcast O(labels) aggregate."""
    from kinesis_app_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    topk = brute_force_topk(emb, queries, k=10)
    labels = emb.select("vec_id", "label")
    label_counts = emb.groupBy("label").agg(F.count("*").alias("n_label"))
    ql = (
        queries.select("vec_id", "label")
        .join(F.broadcast(label_counts), "label")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            (F.col("n_label") - 1).alias("n_relevant"),
        )
    )
    hits = (
        topk.join(F.broadcast(ql), "query_id")
        .join(
            F.broadcast(labels.withColumnRenamed("vec_id", "neighbor_id")),
            "neighbor_id",
        )
        .withColumn("is_rel", (F.col("label") == F.col("qlabel")).cast("int"))
    )
    m = F.least(F.lit(10), F.col("n_relevant"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), m),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.max("qlabel").cast("long").alias("qlabel"),
            F.max("n_relevant").cast("long").alias("n_relevant"),
            F.sum("is_rel").cast("long").alias("n_hits_at_10"),
            F.round(
                F.sum("is_rel")
                / F.least(F.lit(10), F.max("n_relevant")).cast("double"),
                4,
            ).alias("recall_at_10"),
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    / F.min(F.when(F.col("is_rel") == 1, F.col("rank"))),
                    F.lit(0.0),
                ),
                4,
            ).alias("mrr_at_10"),
            F.round(
                F.sum(
                    F.col("is_rel")
                    / F.log2(F.col("rank").cast("double") + 1.0)
                )
                / F.max(idcg),
                4,
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


RETRIEVAL_EVAL_SQL = """
WITH topk AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel, c.vec_id AS neighbor_id,
         c.label AS clabel,
         CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[],
                                                 q.embedding::DOUBLE[]), 6) DESC,
                    c.vec_id) AS INTEGER) AS rank
  FROM (SELECT * FROM embeddings WHERE vec_id < 50) q
  JOIN embeddings c ON c.vec_id != q.vec_id
  QUALIFY rank <= 10
), lc AS (
  SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1
), hits AS (
  SELECT t.query_id, t.qlabel, t.rank,
         CASE WHEN t.clabel = t.qlabel THEN 1 ELSE 0 END AS is_rel,
         lc.n_label - 1 AS n_relevant
  FROM topk t JOIN lc ON lc.label = t.qlabel
)
SELECT query_id,
       CAST(max(qlabel) AS BIGINT) AS qlabel,
       CAST(max(n_relevant) AS BIGINT) AS n_relevant,
       CAST(sum(is_rel) AS BIGINT) AS n_hits_at_10,
       round(sum(is_rel) / CAST(least(10, max(n_relevant)) AS DOUBLE), 4)
         AS recall_at_10,
       round(coalesce(1.0 / min(CASE WHEN is_rel = 1 THEN rank END), 0.0), 4)
         AS mrr_at_10,
       round(sum(is_rel / log2(CAST(rank AS DOUBLE) + 1.0))
             / max((SELECT sum(1.0 / log2(CAST(i AS DOUBLE) + 1.0))
                    FROM unnest(generate_series(1, least(10, n_relevant))) AS t(i))),
             4) AS ndcg_at_10
FROM hits
GROUP BY query_id
ORDER BY query_id
"""


def hard_negative_mining(spark, sf_dir):
    """Contrastive-training data prep: for each query vector, the single
    most similar vector with a DIFFERENT label — the canonical hard
    negative. Same broadcast-query/scan-corpus shape as KNN; the
    different-label filter applies before the per-query top-1 window, so
    ranking partitions stay candidate-sized."""
    from kinesis_app_spark.functions.vector import cosine_similarity
    from kinesis_app_spark.operators.util import spread

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    c = spread(emb).select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("negative_id") != F.col("query_id"))
        .filter(F.col("nlabel") != F.col("qlabel"))
        .select(
            "query_id",
            "qlabel",
            "negative_id",
            "nlabel",
            F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("qlabel").cast("long").alias("qlabel"),
            "negative_id",
            F.col("nlabel").cast("long").alias("nlabel"),
            "cos",
        )
        .orderBy("query_id")
    )


HARD_NEGATIVE_SQL = """
SELECT query_id, qlabel, negative_id, nlabel, cos
FROM (
  SELECT q.vec_id AS query_id, CAST(q.label AS BIGINT) AS qlabel,
         c.vec_id AS negative_id, CAST(c.label AS BIGINT) AS nlabel,
         round(list_cosine_similarity(c.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 6) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(c.embedding::DOUBLE[],
                                                 q.embedding::DOUBLE[]), 6) DESC,
                    c.vec_id) AS rk
  FROM (SELECT * FROM embeddings WHERE vec_id < 50) q
  JOIN embeddings c ON c.vec_id != q.vec_id AND c.label != q.label
)
WHERE rk = 1
ORDER BY query_id
"""


REGISTRY_HYBRID = {
    "hybrid_rrf_search": QuerySpec(hybrid_rrf_search, HYBRID_RRF_SQL),
    "retrieval_eval_metrics": QuerySpec(
        retrieval_eval_metrics, RETRIEVAL_EVAL_SQL
    ),
    "hard_negative_mining": QuerySpec(hard_negative_mining, HARD_NEGATIVE_SQL),
}
