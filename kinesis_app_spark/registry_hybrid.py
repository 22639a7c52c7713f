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


REGISTRY_HYBRID = {
    "hybrid_rrf_search": QuerySpec(hybrid_rrf_search, HYBRID_RRF_SQL),
}
