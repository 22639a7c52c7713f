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


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul — the scale path.

    The Column-algebra variant (brute_force_topk) evaluates one
    zip_with+aggregate expression per (query, candidate) pair; fine for
    oracle checks, but the arithmetic is interpreted per element. Here the
    query set is collected once (it must be broadcastable — same
    precondition as the other variant), L2-normalized into a (Q, d) numpy
    matrix, and each Arrow batch of the corpus becomes a (B, d) matrix: one
    BLAS matmul scores B*Q pairs, a partial argpartition keeps the per-batch
    top-k, and a final groupBy merges batch winners. Corpus is scanned once,
    never shuffled; the only shuffled rows are Q*k per batch.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        # empty query set: empty result, not a 1-D-array normalize crash
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bq_mat = spark.sparkContext.broadcast(q_mat)

    def kernel(batches):
        qi, qm = bq_ids.value, bq_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            scores = c_mat @ qm.T  # (B, Q)
            out_q, out_n, out_c = [], [], []
            top = min(k + 1, len(c_ids))  # +1: self-match dropped later
            for j in range(len(qi)):
                col = scores[:, j]
                idx = np.argpartition(-col, top - 1)[:top]
                out_q.extend([qi[j]] * len(idx))
                out_n.extend(c_ids[idx])
                out_c.extend(np.round(col[idx], 6))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    partial = spread(corpus.select(id_col, vec_col)).mapInPandas(
        kernel, "query_id long, neighbor_id long, cos double"
    )
    return top_k_per_group(
        partial.filter(F.col("neighbor_id") != F.col("query_id")),
        keys=["query_id"],
        order=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )


def radius_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All corpus vectors with cosine >= threshold of each query (range
    search — the retrieval twin of embedding near-dup).

    Same scan shape as brute_force_topk: broadcast query set, one corpus
    scan, no corpus shuffle — but no top-k shuffle either: the threshold
    filter happens inside the scan's projection, so the operator is
    scan + broadcast-join + filter, fully pipelined.

    Returns (query_id, neighbor_id, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6))
        .filter(F.col("cos") >= threshold)
        .select("query_id", "neighbor_id", "cos")
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iterations: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement passes over broadcast centroids (deterministic, no
    RNG): assign each corpus vector to its nearest centroid, recompute
    cell means element-wise, keep the previous centroid for any emptied
    cell.

    The iterative-algorithm pattern on Spark: the loop lives on the driver,
    each iteration is one corpus scan (broadcast join, no corpus shuffle)
    plus a posexplode+groupBy mean whose shuffle is (cell, dim, partials) —
    tiny. Returns (cell, centv).
    """
    cents = centroids
    for _ in range(iterations):
        # per-row id as the argmax group key: shuffling a long beats
        # shuffling the float vector itself as a group key (the vector
        # still travels, but only as payload, not as hash/compare key)
        assigned = (
            corpus.select(F.col(vec_col).alias("v"))
            .withColumn("row_id", F.monotonically_increasing_id())
            .crossJoin(F.broadcast(cents))
            .withColumn("cos", cosine_similarity(F.col("v"), F.col("centv")))
        )
        best = top_k_per_group(
            assigned,
            keys=["row_id"],
            order=[F.col("cos").desc(), F.col("cell").asc()],
            k=1,
        ).select("cell", "v")
        means = (
            best.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("centv")
            )
        )
        # emptied cells keep their previous centroid
        kept = cents.join(means.select("cell"), "cell", "left_anti")
        cents = means.unionByName(kept)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    refine_iterations: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_quantize: int | None = None,
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) partitioning.

    Seed centroids are the first n_centroids corpus vectors by id —
    deterministic without an RNG; ``refine_iterations`` Lloyd passes
    (kmeans_refine) tighten the cells. Corpus assignment = argmax cosine vs
    broadcast centroids (single corpus scan); each query probes its nprobe
    nearest cells.

    ``cell_quantize=d`` rounds the centroid-affinity scores to d decimals
    BEFORE the argmax/probe ranking (ties then break on cell asc): cell
    assignment becomes portable across engines — a last-ULP difference in
    two engines' dot products can otherwise flip an argmax — which is
    what lets the aggressively-pruned path itself sit under a value gate
    instead of only a recall test.
    """
    cents = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            F.col(vec_col).alias("centv"),
        )
    )
    if refine_iterations:
        cents = kmeans_refine(
            corpus, cents, iterations=refine_iterations, vec_col=vec_col
        )

    def assign(df: DataFrame, vcol: str, out: str, top: int) -> DataFrame:
        aff = cosine_similarity(F.col(vcol), F.col("centv"))
        if cell_quantize is not None:
            aff = F.round(aff, cell_quantize)
        scored = df.crossJoin(F.broadcast(cents)).withColumn("cell_cos", aff)
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


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    rerank_factor: int = 4,
    train_max: int = 512,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization ANN: compress each vector to ``m`` sub-space
    code indices, score candidates in the compressed domain (asymmetric
    distance: per-query lookup table, no vector math per candidate), then
    exact-rerank the top ``rerank_factor * k`` by true cosine.

    The 100 TB story is memory, not FLOPs: an m=8, 16-code PQ index is 8
    bytes/vector vs 256 for the float32 vector — the whole index of a
    10^10-vector corpus fits a modest cluster's RAM, and the scan reads
    codes, not embeddings. Training (k-means per sub-space) runs
    driver-side on a deterministically sampled, hard-capped set
    (<= train_max rows) — the same boundedness contract as the broadcast
    query set; encoding and search are Arrow-batched numpy over the
    distributed corpus, which is scanned once and never shuffled.

    Approximate: candidate sets are PQ-specific (rows-only at the gate);
    recall vs brute force is asserted in tests. Returns
    (query_id, neighbor_id, cos, rank) like the exact variants.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # --- deterministic bounded training sample -> per-subspace k-means
    n = corpus.count()
    stride = max(1, n // train_max)
    train_rows = (
        corpus.filter(F.col(id_col) % stride == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_max)
        .collect()
    )
    if not train_rows:
        # empty corpus: no codebooks to train, nothing to search
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    train = np.array([r[vec_col] for r in train_rows], dtype=np.float64)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    d = train.shape[1]
    if d % m:
        raise ValueError(f"pq_topk: dim {d} not divisible by m={m}")
    sub = d // m
    codebooks = np.empty((m, n_codes, sub))
    for s in range(m):
        x = train[:, s * sub : (s + 1) * sub]
        cb = x[:n_codes].copy()  # deterministic init: first rows in id order
        for _ in range(5):  # Lloyd
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                pts = x[assign == c]
                if len(pts):
                    cb[c] = pts.mean(axis=0)
        codebooks[s] = cb
    bcb = spark.sparkContext.broadcast(codebooks)

    # --- query-side lookup tables (Q, m, n_codes) of dot products
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    tables = np.stack(
        [
            np.stack(
                [
                    q_mat[:, s * sub : (s + 1) * sub] @ codebooks[s, c]
                    for c in range(n_codes)
                ],
                axis=1,
            )
            for s in range(m)
        ],
        axis=1,
    )  # (Q, m, n_codes): dot of query sub-vector with each codeword
    bq_ids = spark.sparkContext.broadcast(q_ids)
    btab = spark.sparkContext.broadcast(tables)

    top = rerank_factor * k + 1  # +1: self-match dropped at rerank

    def kernel(batches):
        cb, qi, tab = bcb.value, bq_ids.value, btab.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            # encode batch: per-subspace nearest codeword
            codes = np.empty((len(c_ids), m), dtype=np.int64)
            for s in range(m):
                x = c_mat[:, s * sub : (s + 1) * sub]
                d2 = ((x[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            # ADC score: sum of table lookups, approximates cosine
            out_q, out_n, out_s = [], [], []
            t = min(top, len(c_ids))
            for j in range(len(qi)):
                approx = tab[j, np.arange(m)[None, :], codes].sum(axis=1)
                idx = np.argpartition(-approx, t - 1)[:t]
                out_q.extend([qi[j]] * len(idx))
                out_n.extend(c_ids[idx])
                out_s.extend(approx[idx])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx": out_s}
            )

    partial = spread(corpus.select(id_col, vec_col)).mapInPandas(
        kernel, "query_id long, neighbor_id long, approx double"
    )
    # keep the global top candidates per query in the compressed domain,
    # then exact-rerank them by true cosine against the corpus vectors
    cand = top_k_per_group(
        partial.filter(F.col("neighbor_id") != F.col("query_id")),
        keys=["query_id"],
        order=[F.col("approx").desc(), F.col("neighbor_id").asc()],
        k=rerank_factor * k,
        rank_col="__crank",
        keep_rank=False,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    rescored = (
        cand.join(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6))
    )
    return top_k_per_group(
        rescored.select("query_id", "neighbor_id", "cos"),
        keys=["query_id"],
        order=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )
