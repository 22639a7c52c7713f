"""Similarity search over embedding columns (array<float>).

Two tiers, per the scale plan:
- brute_force_topk: broadcast the (small) query set against the corpus —
  a single scan of the corpus, no shuffle except the final per-query top-k
  (TakeOrdered per group). Exact; the oracle-checkable baseline. At 100 TB
  this is the right plan whenever |queries| is broadcastable: the corpus is
  read once and never shuffled.
- ivf_topk: IVF-style: deterministic coarse centroids, corpus pre-assigned
  to its nearest centroid (one scan, broadcast centroids), queries probe
  only the nprobe nearest cells — prunes the scanned corpus by
  ~nprobe/n_centroids. Approximate; recall tested against brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_app_spark.functions.vector import cosine_similarity
from kinesis_app_spark.operators.relational import top_k_per_group
from kinesis_app_spark.operators.util import spread


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Deterministic: ties broken by neighbor id ascending.
    Returns (query_id, neighbor_id, cos, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6))
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "cos"),
        keys=["query_id"],
        order=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) partitioning.

    Centroids are the first n_centroids corpus vectors by id — deterministic
    without an RNG; one k-means refinement pass would slot in here
    unchanged. Corpus assignment = argmax cosine vs broadcast centroids
    (single corpus scan); each query probes its nprobe nearest cells.
    """
    cents = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            F.col(vec_col).alias("centv"),
        )
    )

    def assign(df: DataFrame, vcol: str, out: str, top: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).withColumn(
            "cell_cos", cosine_similarity(F.col(vcol), F.col("centv"))
        )
        return top_k_per_group(
            scored.drop("centv"),
            keys=[df.columns[0]],
            order=[F.col("cell_cos").desc(), F.col("cell").asc()],
            k=top,
        ).withColumnRenamed("cell", out)

    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c_assigned = assign(c, "cv", "cell_id", 1).drop("cell_cos")
    q_probed = assign(q, "qv", "cell_id", nprobe).drop("cell_cos")

    scored = (
        c_assigned.join(q_probed, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6))
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "cos").distinct(),
        keys=["query_id"],
        order=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )
