"""Behavioral-analytics + training-data-prep queries: session path
mining, gap-filled time series, graph triangle counting, deterministic
train/validation/test splits, and class-balanced downsampling.

Scale shapes: paths reuse the sessionize shuffle (one Exchange+Sort for
flag, cumsum, and path fold); gap-fill joins a per-type calendar that is
O(types x days) regardless of event volume; the triangle count runs on
the repeat-pair subgraph (document-frequency-style edge gate keeps the
wedge join bounded); splits/balancing are pure hash arithmetic — no
randomness, so the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.operators.baskets import basket_pairs
from kinesis_app_spark.operators.sessionize import sessionize
from kinesis_app_spark.registry_util import QuerySpec, table as _t


# =====================================================================
# session path mining
# =====================================================================

def session_paths_topk(spark, sf_dir):
    """Top-20 session journeys: the first 5 event types of each 30-min
    session, joined with '>'. Reuses sessionize()'s lag+cumsum session
    ids (one shuffle on user_id; the per-session fold groups on the same
    key so AQE co-partitions it), then one tiny aggregate over distinct
    path strings. Events fold in event_id order (= arrival order; ids
    are assigned in ts order)."""
    e = _t(spark, sf_dir, "events")
    s = sessionize(e, gap_minutes=30.0)
    paths = s.groupBy("user_id", "session_idx").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.slice(
                    F.sort_array(
                        F.collect_list(F.struct("event_id", "event_type"))
                    ),
                    1,
                    5,
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


SESSION_PATHS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), paths AS (
  SELECT user_id, session_idx,
         array_to_string(list(event_type ORDER BY event_id)[1:5], '>') AS path
  FROM sess GROUP BY 1, 2
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT 20
"""


# =====================================================================
# gap-filled daily time series (forward fill)
# =====================================================================

def timeseries_gapfill_ffill(spark, sf_dir):
    """Per-type daily value sums on a dense calendar: days with no events
    are emitted with the last observed value (forward fill) and flagged.
    The calendar explode is O(types x days) — independent of event
    volume — and the fill is one window per type ordered by day, whose
    partition width is bounded by the date span, not the corpus."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("day_value"),
            F.col("day_value").isNull().alias("is_filled"),
        )
        .orderBy("event_type", "day")
    )


GAPFILL_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(sum(value), 2) AS day_value
  FROM events GROUP BY 1, 2
), cal AS (
  SELECT event_type,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily GROUP BY event_type
)
SELECT c.event_type, c.day,
       last_value(d.day_value IGNORE NULLS)
         OVER (PARTITION BY c.event_type ORDER BY c.day) AS day_value,
       d.day_value IS NULL AS is_filled
FROM cal c LEFT JOIN daily d
  ON c.event_type = d.event_type AND c.day = d.day
ORDER BY 1, 2
"""


# =====================================================================
# graph triangle counting
# =====================================================================

def triangle_count_parts(spark, sf_dir):
    """Triangle census of the repeat-co-purchase graph: parts are linked
    when they co-occur in >= 2 orders (the >=2 gate is the edge-level
    analogue of the hot-shingle document-frequency cap — it bounds the
    wedge join the same way, and keeps the subgraph size stable across
    SFs). Triangles via the oriented wedge join: edges carry a < b, so
    each triangle a<b<c is counted exactly once by joining wedge (a->b,
    b->c) against closing edge (a,c) — two equi joins, no cartesian. At
    scale, orient edges toward the higher-degree endpoint instead of the
    id order to bound per-node wedge fan-out."""
    l = _t(spark, sf_dir, "lineitem")
    edges = (
        basket_pairs(l, basket_col="l_orderkey", item_col="l_partkey",
                     max_basket_size=20)
        .filter(F.col("n_baskets") >= 2)
        .select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    )
    # the subgraph is tiny (document-frequency-gated) but feeds 3 plan
    # legs; checkpoint so the basket self-join runs once, not thrice
    edges = edges.localCheckpoint(eager=False)
    wedges = (
        edges.select(F.col("a"), F.col("b"))
        .join(
            edges.select(F.col("a").alias("b"), F.col("b").alias("c")),
            "b",
        )
    )
    tri = wedges.join(
        edges.select("a", F.col("b").alias("c")), ["a", "c"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    nodes = (
        edges.select(F.col("a").alias("n"))
        .union(edges.select(F.col("b").alias("n")))
        .agg(F.count_distinct("n").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))


TRIANGLE_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), sized AS (
  SELECT l_orderkey FROM items GROUP BY 1 HAVING count(*) <= 20
), kept AS (
  SELECT i.* FROM items i JOIN sized USING (l_orderkey)
), e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM kept a JOIN kept b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT
  (SELECT count(DISTINCT n) FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e))
    AS n_nodes,
  (SELECT count(*) FROM e) AS n_edges,
  (SELECT count(*) FROM e t1
     JOIN e t2 ON t1.b = t2.a
     JOIN e t3 ON t3.a = t1.a AND t3.b = t2.b) AS n_triangles
"""


# =====================================================================
# deterministic train/validation/test split
# =====================================================================

def train_test_split_docs(spark, sf_dir):
    """80/10/10 document split assigned by md5(doc_id) — deterministic,
    uniform, and reproducible on any engine (no RNG, no sampling seed
    drift). Per (lang, split): doc count and total chars, the numbers a
    data-mixture plan consumes. Pure per-row arithmetic + one small
    aggregate; at 100 TB this is a single partial-aggregable scan."""
    d = _t(spark, sf_dir, "documents")
    pct = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    split = (
        F.when(pct < 80, "train")
        .when(pct < 90, "validation")
        .otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


SPLIT_SQL = """
WITH tagged AS (
  SELECT lang, n_chars,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS pct
  FROM documents
)
SELECT lang,
       CASE WHEN pct < 80 THEN 'train'
            WHEN pct < 90 THEN 'validation'
            ELSE 'test' END AS split,
       count(*) AS n_docs, sum(n_chars) AS total_chars
FROM tagged
GROUP BY 1, 2
ORDER BY 1, 2
"""


# =====================================================================
# class-balanced downsampling
# =====================================================================

def class_balance_events(spark, sf_dir):
    """Balance event classes to the minority-class size: each type keeps
    its first min-count rows in md5-hash order (a deterministic uniform
    draw — the hash order is a fixed random permutation, so 'first k' is
    an unbiased sample both engines reproduce exactly). One shuffle on
    event_type for the per-class rank; the class-size floor is a 1-row
    broadcast. Per-class partition width = class size — salt the rank
    (rank within hash-prefix buckets, then take proportional heads) if
    one class dominates at scale."""
    e = _t(spark, sf_dir, "events")
    k = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("k"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    ranked = e.select(
        "event_id", "event_type", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("event_id", "event_type")
        .orderBy("event_type", "event_id")
    )


BALANCE_SQL = """
WITH ranked AS (
  SELECT event_id, event_type,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rn
  FROM events
), k AS (
  SELECT min(c) AS k
  FROM (SELECT count(*) AS c FROM events GROUP BY event_type)
)
SELECT event_id, event_type
FROM ranked CROSS JOIN k
WHERE rn <= k.k
ORDER BY event_type, event_id
"""


# =====================================================================
# incremental materialized-view maintenance
# =====================================================================

def incremental_agg_maintenance(spark, sf_dir):
    """Incremental maintenance of a per-(type, day) aggregate view: the
    'base' state is the aggregate over the first 80% of events
    (event_id < 48000), a 'delta' micro-batch arrives (the remaining
    ids), and the view is refreshed by aggregating ONLY the delta and
    merging it into the base by key — never re-reading base rows. This
    is how a 100 TB rollup stays fresh: refresh cost scales with the
    delta, not the table; the merge is a keyed union+re-agg, exactly
    the additive-measure IVM rule (counts and sums compose; measures
    like DISTINCT need a sketch or a full group recompute — documented
    limitation, not hidden). The oracle recomputes the view from
    scratch, proving merged == full."""
    e = _t(spark, sf_dir, "events")

    def rollup(df):
        return df.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("value_sum"),
        )

    base = rollup(e.filter(F.col("event_id") < 48000))
    delta = rollup(e.filter(F.col("event_id") >= 48000))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum").cast("decimal(30,8)").alias("value_sum"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        F.col("n_events").cast("long"),
        F.round("value_sum", 2).cast("double").alias("value_sum"),
    ).orderBy("event_type", "day")


INCREMENTAL_AGG_SQL = """
SELECT event_type,
       date_trunc('day', ts) AS day,
       count(*) AS n_events,
       round(sum(CAST(value AS DECIMAL(30,8))), 2)::DOUBLE AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# =====================================================================
# GDPR erasure propagation report
# =====================================================================

def gdpr_erasure_report(spark, sf_dir):
    """Right-to-be-forgotten pre-flight: for a deterministic erasure
    cohort (user_id % 97 == 0 — in production, the DSR request table),
    report what a purge touches per event type: rows, exact value mass,
    and the cohort's share of each type. The subject list is broadcast
    (DSR batches are thousands of ids, facts are the 100 TB side), so
    the fact table is scanned once with the membership probe inside the
    scan's codegen; a LEFT SEMI form of the same plan is the actual
    delete's read side. Decimal mass so the compliance report is
    reproducible to the cent."""
    e = _t(spark, sf_dir, "events")
    subjects = (
        e.select("user_id").distinct().filter(F.col("user_id") % 97 == 0)
    )
    hit = e.join(F.broadcast(subjects), "user_id", "left_semi")
    per_type = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return (
        hit.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_purge"),
            F.count_distinct("user_id").alias("n_subjects"),
            F.round(F.sum(F.col("value").cast("decimal(30,8)")), 2)
            .cast("double")
            .alias("value_purged"),
        )
        .join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "n_purge",
            "n_subjects",
            "value_purged",
            F.round(F.col("n_purge") / F.col("n_total"), 6).alias("purge_frac"),
        )
        .orderBy("event_type")
    )


GDPR_SQL = """
WITH hit AS (
  SELECT * FROM events WHERE user_id % 97 = 0
), tot AS (
  SELECT event_type, count(*) AS n_total FROM events GROUP BY 1
)
SELECT h.event_type,
       count(*) AS n_purge,
       count(DISTINCT h.user_id) AS n_subjects,
       round(sum(CAST(h.value AS DECIMAL(30,8))), 2)::DOUBLE AS value_purged,
       round(count(*) / any_value(t.n_total), 6) AS purge_frac
FROM hit h JOIN tot t USING (event_type)
GROUP BY h.event_type
ORDER BY h.event_type
"""


# =====================================================================
# embedding covariance / mean (corpus vector statistics)
# =====================================================================

def embedding_covariance(spark, sf_dir):
    """Upper-triangle covariance of the embedding corpus — the statistics
    behind PCA whitening and drift monitors.

    This is the one operator family where built-in Column algebra is the
    WRONG tool: expressing the Gram matrix relationally explodes every row
    into d(d+1)/2 = 2080 (i, j, product) structs — 4.2M shuffled rows at
    just 2k vectors (measured 6.2s at sf0.1). Instead an Arrow
    ``mapInPandas`` kernel computes each batch's partial Gram with ONE
    int64 ``X.T @ X`` (BLAS, d×d state) and emits only the 2144
    (i, j, partial) cells per batch — the shuffle volume drops by the
    batch size factor, and at 100 TB the reduce state is still d² cells
    regardless of corpus size. Arithmetic is identical to the relational
    form: embeddings scale to exact 1e-6 integers, per-batch sums are
    exact int64 (|x|≲3e5 → products ≲9e10, ×10k-row Arrow batch ≲9e14),
    cross-batch accumulation is decimal(38,0) — reassociation-proof, so
    the DuckDB oracle still hash-matches bit-for-bit."""
    import numpy as np
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("long"),
    )
    scaled = emb.select(v.alias("v"))

    def partial_gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["v"].to_numpy()).astype(np.int64)
            g = x.T @ x
            s = x.sum(axis=0)
            d = x.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    # j = -1 rows carry the per-dimension sums Σx_i
                    "i": np.concatenate([iu, np.arange(d)]),
                    "j": np.concatenate([ju, np.full(d, -1)]),
                    "s": np.concatenate([g[iu, ju], s]),
                }
            )

    parts = scaled.mapInPandas(partial_gram, schema="i int, j int, s long")
    sums = parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )
    g = sums.filter(F.col("j") >= 0)
    dim = sums.filter(F.col("j") == -1).select(
        F.col("i").alias("d"), F.col("s").alias("sd")
    )
    n = emb.count()
    return (
        g.join(F.broadcast(dim.withColumnRenamed("d", "i").withColumnRenamed("sd", "sx")), "i")
        .join(F.broadcast(dim.withColumnRenamed("d", "j").withColumnRenamed("sd", "sy")), "j")
        .select(
            "i",
            "j",
            F.round(
                (
                    F.col("s") / F.lit(float(n))
                    - (F.col("sx") / F.lit(float(n)))
                    * (F.col("sy") / F.lit(float(n)))
                )
                / 1e12,
                8,
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


EMBEDDING_COV_SQL = """
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS v
  FROM embeddings
), n AS (SELECT count(*) AS cnt FROM embeddings),
exploded AS (
  SELECT i.i AS i, j.j AS j,
         s.v[i.i + 1] * s.v[j.j + 1] AS xy,
         s.v[i.i + 1] AS x,
         s.v[j.j + 1] AS y
  FROM scaled s,
       UNNEST(generate_series(0, len(s.v) - 1)) AS i(i),
       UNNEST(generate_series(0, len(s.v) - 1)) AS j(j)
  WHERE j.j >= i.i
)
SELECT i, j,
       round((sum(xy) / any_value(cnt)
              - (sum(x) / any_value(cnt)) * (sum(y) / any_value(cnt)))
             / 1e12, 8) AS cov
FROM exploded CROSS JOIN n
GROUP BY i, j
ORDER BY i, j
"""


# =====================================================================
# PCA top component via power iteration over the exact covariance
# =====================================================================

_PCA_ITERS = 8


def _q(x: float, dp: int) -> float:
    """DuckDB round() semantics (half away from zero) — the shared
    quantization that pins every power-iteration step to a grid so the
    engine's and the oracle's float paths cannot drift apart."""
    import math

    scale = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def pca_power_iteration(spark, sf_dir):
    """Top principal component of the embedding corpus: 8 power-
    iteration steps on the EXACT covariance matrix (the value-gated
    embedding_covariance output), emitting per-dimension loadings, the
    dominant eigenvalue (Rayleigh quotient) and the explained-variance
    ratio (eigenvalue / trace).

    Determinism across engines is by construction, not luck: the
    covariance is already quantized to 8 dp (and exact by the int64
    Gram discipline), and every iteration step re-quantizes the
    matvec, the norm, and the normalized vector to 9 dp with the same
    rounding rule — both engines walk the identical grid, so the
    unrolled-CTE oracle hash-matches.

    Scale shape: the distributed heavy lift is the covariance reduce
    (d² cells regardless of corpus size, see embedding_covariance);
    the eigensolve itself is O(d²) per step on a d x d = 64 x 64
    matrix — collected to the driver under the documented d(d+1)/2 =
    2080-row bound, exactly where any production system solves it."""
    cov_rows = embedding_covariance(spark, sf_dir).collect()
    d = 1 + max(r["i"] for r in cov_rows)
    c = [[0.0] * d for _ in range(d)]
    for r in cov_rows:
        c[r["i"]][r["j"]] = r["cov"]
        c[r["j"]][r["i"]] = r["cov"]
    import math

    # all-ones start: e_1 can be exactly orthogonal (under C) to the
    # dominant component when the data has block structure; the uniform
    # vector overlaps every axis
    v = [_q(1.0 / math.sqrt(d), 9)] * d

    for _ in range(_PCA_ITERS):
        mv = [_q(sum(c[i][j] * v[j] for j in range(d)), 9) for i in range(d)]
        norm = _q(math.sqrt(sum(x * x for x in mv)), 9)
        v = [_q(x / norm, 9) for x in mv]
    mv = [_q(sum(c[i][j] * v[j] for j in range(d)), 9) for i in range(d)]
    lam = _q(sum(a * b for a, b in zip(v, mv)), 6)
    trace = sum(c[i][i] for i in range(d))
    evr = _q(lam / trace, 6)
    out = [
        (i, _q(v[i], 6), lam, evr)
        for i in range(d)
    ]
    return spark.createDataFrame(
        out, "dim int, loading double, eigenvalue double, evr double"
    ).orderBy("dim")


def _pca_oracle_sql() -> str:
    """Unrolled power iteration as CTEs over the covariance CTE —
    generated, not hand-written, so the iteration count and rounding
    rule stay in one place."""
    cov_cte = EMBEDDING_COV_SQL.strip().rstrip().removesuffix("ORDER BY i, j").strip()
    # wrap: cov query (upper triangle) -> symmetric matrix
    parts = [
        f"WITH covq AS MATERIALIZED ({cov_cte}),",
        "sym AS MATERIALIZED (",
        "  SELECT i, j, cov FROM covq",
        "  UNION ALL",
        "  SELECT j AS i, i AS j, cov FROM covq WHERE i <> j",
        "),",
        "dims AS MATERIALIZED (SELECT DISTINCT i FROM sym),",
        "v0 AS (",
        "  SELECT i AS d,",
        "         round(1.0 / sqrt((SELECT count(*) FROM dims)), 9) AS val",
        "  FROM dims",
        "),",
    ]
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        parts += [
            f"mv{k} AS MATERIALIZED (",
            f"  SELECT s.i AS d, round(sum(s.cov * v.val), 9) AS val",
            f"  FROM sym s JOIN {prev} v ON s.j = v.d GROUP BY s.i",
            "),",
            f"n{k} AS (SELECT round(sqrt(sum(val * val)), 9) AS nrm FROM mv{k}),",
            f"v{k} AS MATERIALIZED (SELECT d, round(val / nrm, 9) AS val"
            f" FROM mv{k} CROSS JOIN n{k}),",
        ]
        prev = f"v{k}"
    parts += [
        "mvf AS (",
        f"  SELECT s.i AS d, round(sum(s.cov * v.val), 9) AS val",
        f"  FROM sym s JOIN {prev} v ON s.j = v.d GROUP BY s.i",
        "),",
        "lam AS (",
        f"  SELECT round(sum(v.val * m.val), 6) AS l",
        f"  FROM {prev} v JOIN mvf m USING (d)",
        "),",
        "tr AS (SELECT sum(cov) AS t FROM covq WHERE i = j)",
        "SELECT CAST(v.d AS INT) AS dim,",
        "       round(v.val, 6) AS loading,",
        "       l AS eigenvalue,",
        "       round(l / t, 6) AS evr",
        f"FROM {prev} v CROSS JOIN lam CROSS JOIN tr",
        "ORDER BY dim",
    ]
    return "\n".join(parts)


PCA_POWER_SQL = _pca_oracle_sql()


REGISTRY_ANALYTICS3 = {
    "incremental_agg_maintenance": QuerySpec(
        incremental_agg_maintenance, INCREMENTAL_AGG_SQL
    ),
    "pca_power_iteration": QuerySpec(pca_power_iteration, PCA_POWER_SQL),
    "gdpr_erasure_report": QuerySpec(gdpr_erasure_report, GDPR_SQL),
    "embedding_covariance": QuerySpec(embedding_covariance, EMBEDDING_COV_SQL),
    "session_paths_topk": QuerySpec(session_paths_topk, SESSION_PATHS_SQL),
    "timeseries_gapfill_ffill": QuerySpec(
        timeseries_gapfill_ffill, GAPFILL_SQL
    ),
    "triangle_count_parts": QuerySpec(triangle_count_parts, TRIANGLE_SQL),
    "train_test_split_docs": QuerySpec(train_test_split_docs, SPLIT_SQL),
    "class_balance_events": QuerySpec(class_balance_events, BALANCE_SQL),
}
