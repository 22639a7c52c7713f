"""Persistent vector indexes: build-once / query-many ANN.

The fused operators (operators/similarity.py ivf_topk, pq_topk) retrain
their coarse centroids / codebooks inside every query — fine for a
one-shot job, wrong for production ANN where one nightly build serves
millions of queries. This module splits the lifecycle:

- ``ivf_build(corpus, index_dir)`` writes the index as plain parquet
  tables: ``centroids`` (cell, centv) and ``postings`` — the inverted
  file — PARTITIONED BY cell, so a query probing nprobe of C cells
  prunes (C - nprobe)/C of the data at the DIRECTORY level (Spark
  partition pruning, visible as PartitionFilters in the scan).
- ``ivf_query(spark, index_dir, queries)`` touches ONLY the index
  tables: centroids (tiny, broadcast) to pick probe cells, then a
  partition-pruned postings scan for exact rescoring. The corpus
  DataFrame is not an input — there is nothing to recompute.

At 100 TB the build is the one full-corpus job (scan + broadcast
centroid argmax + partitioned write, no corpus shuffle besides the
write's cell clustering); queries read back only the probed cells.

The reference (/root/reference) has no vector surface at all (its
computation surface is the Processor callback,
src/Kinesis/Coordination.hs:51-53); this is engine surface per
SURVEY.md §2.2 north-star similarity search.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_app_spark.functions.vector import cosine_similarity
from kinesis_app_spark.operators.relational import top_k_per_group
from kinesis_app_spark.operators.similarity import kmeans_refine
from kinesis_app_spark.operators.util import spread


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic single-writer manifest update: temp file + ``os.replace``
    — a crash mid-update leaves the OLD manifest intact (Spark's
    ``mode("overwrite")`` deletes-then-writes, which can leave NO
    manifest; round-4 advice). Legacy directory-form manifests (written
    by Spark in earlier rounds) are cleared first."""
    import shutil

    path = os.path.join(index_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    if os.path.isdir(path):  # legacy Spark-written manifest directory
        shutil.rmtree(path)
    os.replace(tmp, path)


def _read_manifest(spark: SparkSession, index_dir: str) -> dict:
    """Manifest as a plain dict; reads both the current single-file form
    and the legacy Spark-written directory form."""
    path = os.path.join(index_dir, "manifest.json")
    if os.path.isfile(path):
        with open(path) as fh:
            return json.load(fh)
    return spark.read.json(path).collect()[0].asDict()


def ivf_build(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    refine_iterations: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Build and persist an IVF index under ``index_dir``.

    Layout (all plain parquet — readable by any engine):
      centroids.parquet   (cell int, centv array<float>)
      postings.parquet/   partitioned by cell: (vec_id, embedding)
      manifest.json/      1 row: n_centroids, n_rows, dims, vec/id cols

    Centroid seeding/refinement is the deterministic discipline of
    ivf_topk (first n_centroids vectors by id, optional Lloyd passes) so
    a fused query and a persisted build+query agree bit-for-bit.
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
    cents = cents.cache()
    cents.write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids.parquet")
    )

    c = spread(corpus).select(id_col, vec_col)
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "cell_cos", cosine_similarity(F.col(vec_col), F.col("centv"))
    )
    assigned = top_k_per_group(
        scored.drop("centv"),
        keys=[id_col],
        order=[F.col("cell_cos").desc(), F.col("cell").asc()],
        k=1,
    ).select("cell", id_col, vec_col)
    # the inverted file: one directory per cell -> query-time partition
    # pruning; maxRecordsPerFile keeps cells splittable at scale
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_dir, "postings.parquet")
    )

    dims = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()
    n_rows = corpus.count()
    _write_manifest(
        index_dir,
        {
            "n_centroids": int(n_centroids),
            "n_rows": int(n_rows),
            "dims": int(dims[0]["d"]) if dims else 0,
            "vec_col": vec_col,
            "id_col": id_col,
        },
    )
    cents.unpersist()


def _guard_query_set(queries: DataFrame, max_queries: int, op: str) -> None:
    """Refuse query sets past the documented bound with a clear error
    instead of a driver OOM (the SemDeDup fat-cluster-guard
    discipline). Both ANN query paths hold per-query state driver-side
    or in a broadcast (ivf: the probe table; pq: the ADC lookup
    tables), so |Q| must stay dimension-sized. For BULK query sets,
    invert the layout: broadcast the INDEX tables and stream the
    queries through mapInPandas (the shape brute_force_topk_np uses) or
    run bounded query batches. The count probe is limit(bound+1) — it
    never scans more than bound+1 rows."""
    n = queries.limit(max_queries + 1).count()
    if n > max_queries:
        raise ValueError(
            f"{op}: query set exceeds max_queries={max_queries} (the "
            "per-query probe/ADC state is driver/broadcast-resident); "
            "batch the queries, raise max_queries deliberately, or "
            "stream queries through a mapInPandas scan against the "
            "broadcast index for bulk sets"
        )


def ivf_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """Query a persisted IVF index: centroids + probed postings cells
    only — the corpus is never an input and nothing is retrained.

    Probe-cell selection runs on the broadcast centroid table; the
    bounded probed-cell set (|Q| * nprobe ids at most) is collected and
    pushed into the postings scan as an isin partition filter, so the
    scan's PartitionFilters prune unprobed cells at file-listing time.
    Returns (query_id, neighbor_id, cos, rank) — the shared ANN shape.
    An index built over an EMPTY corpus answers every query with zero
    rows (manifest short-circuit) — empty partitions are routine at
    scale and must not crash the read path.
    """
    empty = "query_id long, neighbor_id long, cos double, rank int"
    mani = _read_manifest(spark, index_dir)
    if int(mani["n_rows"]) == 0:
        return spark.createDataFrame([], empty)
    _guard_query_set(queries, max_queries, "ivf_query")
    cents = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "cell_cos", cosine_similarity(F.col("qv"), F.col("centv"))
    )
    q_probed = top_k_per_group(
        q_scored.drop("centv"),
        keys=["query_id"],
        order=[F.col("cell_cos").desc(), F.col("cell").asc()],
        k=nprobe,
    ).select("query_id", "qv", "cell")
    # bounded by construction: |queries| * nprobe cell ids
    probe_cells = sorted(
        {r["cell"] for r in q_probed.select("cell").distinct().collect()}
    )
    if not probe_cells:  # empty query set: nothing to probe
        return spark.createDataFrame([], empty)
    postings = spark.read.parquet(
        os.path.join(index_dir, "postings.parquet")
    ).filter(F.col("cell").isin(probe_cells))
    scored = (
        postings.select(
            "cell",
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
        )
        .join(F.broadcast(q_probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6)
        )
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "cos"),
        keys=["query_id"],
        order=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )


def pq_build(
    corpus: DataFrame,
    index_dir: str,
    m: int = 8,
    n_codes: int = 16,
    train_max: int = 512,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Build and persist a product-quantization index.

    Layout:
      codebooks.parquet  (subspace int, code int, centv array<double>)
      codes.parquet      (vec_id, codes array<int>, embedding) — the
                         original vector rides along for exact rerank,
                         the production PQ-with-rerank layout
      manifest.json      (m, n_codes, dims, n_rows)

    Training is the deterministic bounded sample of pq_topk (stride
    sample capped at train_max, Lloyd x5, first-rows init) so fused and
    persisted paths agree exactly.
    """
    import numpy as np

    spark = corpus.sparkSession
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
        # empty corpus: a valid (empty) index — queries answer 0 rows
        spark.createDataFrame(
            [], "subspace int, code int, centv array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "codebooks.parquet")
        )
        spark.createDataFrame(
            [], f"{id_col} long, codes array<int>, {vec_col} array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "codes.parquet")
        )
        _write_manifest(
            index_dir, {"m": m, "n_codes": n_codes, "dims": 0, "n_rows": 0}
        )
        return
    train = np.array([r[vec_col] for r in train_rows], dtype=np.float64)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    d = train.shape[1]
    if d % m:
        raise ValueError(f"pq_build: dim {d} not divisible by m={m}")
    sub = d // m
    codebooks = np.empty((m, n_codes, sub))
    for s in range(m):
        x = train[:, s * sub : (s + 1) * sub]
        cb = x[:n_codes].copy()
        for _ in range(5):
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                pts = x[assign == c]
                if len(pts):
                    cb[c] = pts.mean(axis=0)
        codebooks[s] = cb

    spark.createDataFrame(
        [
            (s, c, [float(v) for v in codebooks[s, c]])
            for s in range(m)
            for c in range(n_codes)
        ],
        "subspace int, code int, centv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "codebooks.parquet")
    )

    bcb = spark.sparkContext.broadcast(codebooks)

    def encode(batches):
        import pandas as pd

        cb = bcb.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                x = c_mat[:, s * sub : (s + 1) * sub]
                d2 = ((x[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes),
                    vec_col: pdf[vec_col],
                }
            )

    spread(corpus.select(id_col, vec_col)).mapInPandas(
        encode, f"{id_col} long, codes array<int>, {vec_col} array<float>"
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "codes.parquet"))

    _write_manifest(
        index_dir,
        {"m": m, "n_codes": n_codes, "dims": int(d), "n_rows": int(n)},
    )


def pq_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = 50_000,
) -> DataFrame:
    """Query a persisted PQ index: codebooks -> per-query ADC lookup
    tables (driver-side, tiny), one scan of the codes table for
    compressed-domain candidates, exact rerank on the stored vectors.
    The corpus is never an input; no codebook is retrained.
    """
    import numpy as np
    import pandas as pd

    mani = _read_manifest(spark, index_dir)
    m, n_codes, d = int(mani["m"]), int(mani["n_codes"]), int(mani["dims"])
    if int(mani["n_rows"]) == 0:  # index over an empty corpus
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    _guard_query_set(queries, max_queries, "pq_query")
    sub = d // m
    cb_rows = spark.read.parquet(
        os.path.join(index_dir, "codebooks.parquet")
    ).collect()
    codebooks = np.empty((m, n_codes, sub))
    for r in cb_rows:
        codebooks[r["subspace"], r["code"]] = r["centv"]

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return spark.createDataFrame(
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
    )
    bq_ids = spark.sparkContext.broadcast(q_ids)
    btab = spark.sparkContext.broadcast(tables)
    top = rerank_factor * k + 1

    def kernel(batches):
        qi, tab = bq_ids.value, btab.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
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

    codes_tbl = spark.read.parquet(os.path.join(index_dir, "codes.parquet"))
    partial = codes_tbl.select(id_col, "codes").mapInPandas(
        kernel, "query_id long, neighbor_id long, approx double"
    )
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
            codes_tbl.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos", F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6)
        )
    )
    return top_k_per_group(
        rescored.select("query_id", "neighbor_id", "cos"),
        keys=["query_id"],
        order=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )


def ivf_append(
    corpus_delta: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental index maintenance: assign ONLY the new vectors to the
    EXISTING (frozen) centroids and append their postings — the nightly
    "index the day's new documents" job, which must not rescan or
    re-cluster the already-indexed corpus. Cost is one scan of the
    delta + a broadcast argmax; the postings table grows by exactly the
    delta's cells (parquet append preserves the cell partitioning, so
    query-time pruning is unchanged).

    Contract: queries against the appended index are exactly queries
    against a fused index sharing the same centroids — with
    nprobe = n_centroids that equals brute force over old + new, which
    is how tests/test_round4.py value-checks this path. Freezing
    centroids is the standard IVF trade: cell balance drifts as the
    corpus grows; rebuild (ivf_build) when recall audits say so.
    """
    spark = corpus_delta.sparkSession
    cents = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    if not cents.limit(1).count():
        # an index built over an EMPTY corpus has no centroids: nothing
        # could be assigned, yet bumping n_rows would make ivf_query
        # bypass its empty-index short-circuit and read a postings dir
        # with no files — refuse loudly instead of losing the delta
        raise ValueError(
            "ivf_append: index has no centroids (built over an empty "
            "corpus) — run ivf_build over the delta instead"
        )
    c = spread(corpus_delta).select(id_col, vec_col)
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "cell_cos", cosine_similarity(F.col(vec_col), F.col("centv"))
    )
    assigned = top_k_per_group(
        scored.drop("centv"),
        keys=[id_col],
        order=[F.col("cell_cos").desc(), F.col("cell").asc()],
        k=1,
    ).select("cell", id_col, vec_col)
    # Observation rides the write: n_rows grows by the rows ACTUALLY
    # appended (one per delta id), measured on the write itself — not by
    # a separate corpus_delta.count() that could disagree with it
    obs = Observation()
    assigned.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "append"
    ).partitionBy("cell").parquet(os.path.join(index_dir, "postings.parquet"))
    n_new = int(obs.get["n"])
    mani = _read_manifest(spark, index_dir)
    mani["n_rows"] = int(mani["n_rows"]) + n_new
    _write_manifest(index_dir, mani)


def _n_parquet_files(table_dir: str) -> int:
    return sum(
        1
        for _root, _dirs, names in os.walk(table_dir)
        for n in names
        if n.endswith(".parquet")
    )


def ivf_optimize(
    spark: SparkSession,
    index_dir: str,
    max_records_per_file: int = 1 << 20,
) -> tuple[int, int]:
    """Compact the postings table: every ``ivf_append`` leaves one small
    file set per touched cell, and at nightly-delta cadence the
    per-cell directories accumulate files until each probed cell pays
    hundreds of file opens — the small-file problem, landing exactly on
    the query path's pruned scan. Rewrites the postings hash-clustered
    so each cell's rows land in one task (one file per cell, split only
    past ``max_records_per_file``), preserving the cell partitioning —
    query results are bit-identical before and after (pinned in
    tests/test_round5.py), and the manifest is untouched (same rows).
    Single-writer maintenance, like the engine's vt_vacuum. Returns
    (files_before, files_after)."""
    import shutil

    if int(_read_manifest(spark, index_dir)["n_rows"]) == 0:
        return 0, 0  # empty index: no postings files to compact
    pdir = os.path.join(index_dir, "postings.parquet")
    before = _n_parquet_files(pdir)
    postings = spark.read.parquet(pdir)
    tmp = pdir + ".compact"
    trash = pdir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        postings.repartition(F.col("cell"))
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("cell")
        .parquet(tmp)
    )
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(pdir, trash)
    os.rename(tmp, pdir)
    shutil.rmtree(trash, ignore_errors=True)
    return before, _n_parquet_files(pdir)


def ivf_remove(
    spark: SparkSession,
    index_dir: str,
    removed: DataFrame,
    id_col: str | None = None,
) -> int:
    """Deletion propagation (the GDPR-erasure path into the persisted
    ANN index): drop the given vector ids from the postings, so no
    future ``ivf_query`` can return an erased vector as a neighbor.
    Cell-targeted rewrite: one semi-join scan finds the (bounded by
    n_centroids) cells holding removed ids and how many rows die; only
    THOSE cell partitions are rewritten — at scale a removal batch
    touches a handful of cells, not the corpus-sized postings table. A
    cell emptied by the removal is deleted outright (dynamic partition
    overwrite would silently leave its old files in place). The
    manifest's n_rows drops by the rows actually removed. Returns that
    count.

    Crash safety (round 6): each live cell dir is renamed ASIDE (to a
    sibling holding area outside the postings dir, so partition
    discovery never sees it) before the rebuilt dir is renamed in —
    the ``_rewrite_swap`` discipline. A crash at any point leaves every
    cell's rows in exactly one of {live, holding}, and the recovery
    preamble on the next call restores any parked cell whose live dir
    is missing — no surviving row can be lost, which matters because
    erasure jobs are exactly the jobs auditors replay. (A crash after
    the swap but before the manifest update leaves ``n_rows``
    over-counting until the next successful maintenance call — metadata
    staleness, never data loss.)"""
    import shutil

    mani = _read_manifest(spark, index_dir)
    if int(mani["n_rows"]) == 0:
        return 0  # empty index: nothing to erase (and no postings files)
    id_col = id_col or mani.get("id_col", "vec_id")
    pdir = os.path.join(index_dir, "postings.parquet")
    old_dir = pdir + ".old-erase"
    # recovery from a prior interrupted removal: a cell parked in the
    # holding area whose live dir is missing was mid-swap — restore it
    # BEFORE reading the postings (the park happens only after the
    # rebuilt copy is complete, so restore-then-redo is always correct)
    if os.path.isdir(old_dir):
        for name in os.listdir(old_dir):
            live = os.path.join(pdir, name)
            if not os.path.exists(live):
                os.rename(os.path.join(old_dir, name), live)
        shutil.rmtree(old_dir, ignore_errors=True)
    ids = removed.select(F.col(id_col).alias(id_col)).distinct()
    postings = spark.read.parquet(pdir)
    hit = (
        postings.join(F.broadcast(ids), id_col, "left_semi")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )  # bounded: at most n_centroids rows
    if not hit:
        return 0
    cells = sorted(int(r["cell"]) for r in hit)
    n_removed = int(sum(r["n"] for r in hit))
    kept = postings.filter(F.col("cell").isin(cells)).join(
        F.broadcast(ids), id_col, "left_anti"
    )
    tmp = pdir + ".rewrite"
    shutil.rmtree(tmp, ignore_errors=True)
    # materialize the kept rows BEFORE touching the live cell dirs
    kept.repartition(F.col("cell")).write.partitionBy("cell").parquet(tmp)
    os.makedirs(old_dir, exist_ok=True)
    for c in cells:
        live = os.path.join(pdir, f"cell={c}")
        rebuilt = os.path.join(tmp, f"cell={c}")
        if os.path.isdir(live):
            # park the live dir aside FIRST — never delete the only copy
            os.rename(live, os.path.join(old_dir, f"cell={c}"))
        if os.path.isdir(rebuilt):  # absent => the cell is now empty
            os.rename(rebuilt, live)
    shutil.rmtree(old_dir, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    mani["n_rows"] = int(mani["n_rows"]) - n_removed
    _write_manifest(index_dir, mani)
    return n_removed


def _pq_encode_writer(spark, codebooks, m, sub, vec_col, id_col):
    """mapInPandas encode kernel against a broadcast codebook tensor —
    shared by pq_build-shaped jobs over any vector frame."""
    import numpy as np

    bcb = spark.sparkContext.broadcast(codebooks)

    def encode(batches):
        import pandas as pd

        cb = bcb.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                x = c_mat[:, s * sub : (s + 1) * sub]
                d2 = ((x[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes),
                    vec_col: pdf[vec_col],
                }
            )

    return encode


def pq_append(
    corpus_delta: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental PQ maintenance: encode ONLY the new vectors against
    the EXISTING (frozen) codebooks and append their codes — the
    ivf_append discipline for the compressed index. Freezing codebooks
    is the standard PQ trade: quantization error drifts as the corpus
    distribution moves; rebuild (pq_build) when a rerank-recall audit
    says so. Exact-rerank results remain exact regardless (the stored
    vector rides along), which is what the tests pin."""
    import numpy as np

    spark = corpus_delta.sparkSession
    mani = _read_manifest(spark, index_dir)
    m, n_codes, d = int(mani["m"]), int(mani["n_codes"]), int(mani["dims"])
    if int(mani["n_rows"]) == 0 or d == 0:
        raise ValueError(
            "pq_append: index has no trained codebooks (built over an "
            "empty corpus) — run pq_build over the delta instead"
        )
    sub = d // m
    cb_rows = spark.read.parquet(
        os.path.join(index_dir, "codebooks.parquet")
    ).collect()
    codebooks = np.empty((m, n_codes, sub))
    for r in cb_rows:
        codebooks[r["subspace"], r["code"]] = r["centv"]
    encode = _pq_encode_writer(spark, codebooks, m, sub, vec_col, id_col)
    obs = Observation()
    (
        spread(corpus_delta.select(id_col, vec_col))
        .mapInPandas(
            encode, f"{id_col} long, codes array<int>, {vec_col} array<float>"
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("append")
        .parquet(os.path.join(index_dir, "codes.parquet"))
    )
    mani["n_rows"] = int(mani["n_rows"]) + int(obs.get["n"])
    _write_manifest(index_dir, mani)


def pq_remove(
    spark: SparkSession,
    index_dir: str,
    removed: DataFrame,
    id_col: str | None = None,
) -> int:
    """Deletion propagation into the PQ index: erased vector ids leave
    the codes table (broadcast anti-join + materialize-then-swap, the
    dedup-index discipline — the codes table is not partitioned, so the
    cell-targeted path has no analogue here), and the manifest count
    drops. Returns the rows actually removed."""
    import shutil

    mani = _read_manifest(spark, index_dir)
    if int(mani["n_rows"]) == 0:
        return 0
    id_col = id_col or "vec_id"
    cdir = os.path.join(index_dir, "codes.parquet")
    ids = removed.select(F.col(id_col).alias(id_col)).distinct()
    codes = spark.read.parquet(cdir)
    n_removed = codes.join(F.broadcast(ids), id_col, "left_semi").count()
    if n_removed == 0:
        return 0
    kept = codes.join(F.broadcast(ids), id_col, "left_anti")
    tmp = cdir + ".rewrite"
    trash = cdir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    kept.write.parquet(tmp)  # materialize BEFORE touching the live table
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(cdir, trash)
    os.rename(tmp, cdir)
    shutil.rmtree(trash, ignore_errors=True)
    mani["n_rows"] = int(mani["n_rows"]) - int(n_removed)
    _write_manifest(index_dir, mani)
    return int(n_removed)


def pq_optimize(
    spark: SparkSession,
    index_dir: str,
    max_records_per_file: int = 1 << 20,
) -> tuple[int, int]:
    """Compact the codes table (one small file set per pq_append at
    production cadence): rewrite range-clustered on the id — which also
    buys footer min/max skipping for the rerank's id-keyed self-join.
    Results are bit-identical before/after. Returns (files_before,
    files_after)."""
    import shutil

    if int(_read_manifest(spark, index_dir)["n_rows"]) == 0:
        return 0, 0
    cdir = os.path.join(index_dir, "codes.parquet")
    before = _n_parquet_files(cdir)
    mani = _read_manifest(spark, index_dir)
    id_col = "vec_id" if "vec_id" in [
        f.name for f in spark.read.parquet(cdir).schema.fields
    ] else spark.read.parquet(cdir).schema.fields[0].name
    codes = spark.read.parquet(cdir)
    clustered = codes.repartitionByRange(F.col(id_col)).sortWithinPartitions(
        F.col(id_col)
    )
    tmp = cdir + ".compact"
    trash = cdir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    clustered.write.option(
        "maxRecordsPerFile", max_records_per_file
    ).parquet(tmp)
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(cdir, trash)
    os.rename(tmp, cdir)
    shutil.rmtree(trash, ignore_errors=True)
    return before, _n_parquet_files(cdir)
