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

from kinesis_app_spark.pinning import pin

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
    edges = edges.transform(pin, eager=False)
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
            # NULL/zero-length vectors contribute nothing to the Gram
            # cells or the column sums (exactly the oracle's UNNEST
            # semantics — no exploded rows) but still count in n via
            # emb.count() below; without the guard np.vstack raises
            arrs = [a for a in pdf["v"] if a is not None and len(a)]
            if not arrs:
                continue
            x = np.vstack(arrs).astype(np.int64)
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
    # pinned: sums feeds THREE consumers (the gram cells + both
    # broadcast dim joins), and without the pin each consumer re-runs
    # the whole corpus-wide Arrow kernel pass — 3 full scans instead of
    # 1 in every PCA entry that collects this (d(d+1)/2+d rows, tiny)
    sums = parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    ).transform(pin, eager=False)
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
# PCA top component via INTEGER-EXACT power iteration
# =====================================================================

_PCA_ITERS = 8


def _q(x: float, dp: int) -> float:
    """DuckDB round() semantics (half away from zero) on a shared
    input — used only on values both engines already hold bit-equal."""
    import math

    scale = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def _iround(x: float) -> int:
    """Round-half-away-from-zero to int — DuckDB round(x) at 0 dp."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _power_iterate(cov_rows):
    """Integer-exact power iteration: returns (v_int 1e-9 units, C_int
    1e-8 units, d).

    Why integers: a float formulation diverged between engines — one
    quantized norm landing a summation-order ULP on a grid boundary
    shifted every loading by ~4e-8 (observed at sf0.001), enough to
    flip a downstream projection's last rounded digit. Here every SUM
    is over exact integers (matvec in 1e-17 units fits int64; the
    squared-norm uses arbitrary precision / HUGEINT), so both engines
    hold bit-identical values at every step; the only float ops are
    scalar sqrt/divide on identical inputs, which IEEE 754 makes
    deterministic."""
    import math

    d = 1 + max(r["i"] for r in cov_rows)
    c = [[0] * d for _ in range(d)]
    for r in cov_rows:
        ci = _iround(r["cov"] * 1e8)
        c[r["i"]][r["j"]] = ci
        c[r["j"]][r["i"]] = ci
    v = _iterate_matrix(c, d)
    return v, c, d


def _iterate_matrix(c, d):
    """The quantized integer iteration core over an integer matrix."""
    import math

    v = [_iround(1e9 / math.sqrt(d))] * d
    for _ in range(_PCA_ITERS):
        mv = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
        nrm = math.sqrt(float(sum(m * m for m in mv)))
        v = [_iround(float(m) / nrm * 1e9) for m in mv]
    return v


def pca_power_iteration(spark, sf_dir):
    """Top principal component of the embedding corpus: 8 power-
    iteration steps on the EXACT covariance matrix (the value-gated
    embedding_covariance output scaled to 1e-8 integers), emitting
    per-dimension loadings, the dominant eigenvalue (Rayleigh
    quotient) and the explained-variance ratio (eigenvalue / trace).

    Determinism across engines is by construction, not luck: the
    iteration state is INTEGER at every step (see _power_iterate), so
    the unrolled-CTE oracle holds bit-identical vectors; all float
    scalar ops run on identical inputs. The all-ones start vector
    avoids the orthogonal-start failure on block-structured data.

    Scale shape: the distributed heavy lift is the covariance reduce
    (d^2 cells regardless of corpus size, see embedding_covariance);
    the eigensolve itself is O(d^2) per step on a d x d = 64 x 64
    matrix — collected to the driver under the documented d(d+1)/2 =
    2080-row bound, exactly where any production system solves it."""
    cov_rows = embedding_covariance(spark, sf_dir).collect()
    if not cov_rows:  # empty corpus: no components, not a crash
        return spark.createDataFrame(
            [], "dim int, loading double, eigenvalue double, evr double"
        )
    v, c, d = _power_iterate(cov_rows)
    mvf = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
    lam_num = sum(a * b for a, b in zip(v, mvf))  # 1e-26 units
    lam = _iround(float(lam_num) / 1e20) / 1e6
    tr = sum(c[i][i] for i in range(d))  # 1e-8 units
    evr = (
        _iround(
            (float(lam_num) / 1e26) / (float(tr) / 1e8) * 1e6
        )
        / 1e6
    )
    out = [
        (i, _iround(x / 1000.0) / 1e6, lam, evr) for i, x in enumerate(v)
    ]
    return spark.createDataFrame(
        out, "dim int, loading double, eigenvalue double, evr double"
    ).orderBy("dim")


def _pca_chain() -> tuple[list[str], str]:
    """Shared CTE chain for the unrolled INTEGER power iteration
    (generated, not hand-written, so the iteration count and scaling
    stay in one place). Returns (WITH-parts, loadings CTE name); the
    loadings relation holds (d, val) with val in 1e-9 integer units."""
    cov_cte = EMBEDDING_COV_SQL.strip().rstrip().removesuffix("ORDER BY i, j").strip()
    parts = [
        f"WITH covq AS MATERIALIZED ({cov_cte}),",
        "cint AS MATERIALIZED (",
        "  SELECT i, j, CAST(round(cov * 1e8) AS BIGINT) AS c FROM covq",
        "),",
        "sym AS MATERIALIZED (",
        "  SELECT i, j, c FROM cint",
        "  UNION ALL",
        "  SELECT j AS i, i AS j, c FROM cint WHERE i <> j",
        "),",
        "dims AS MATERIALIZED (SELECT DISTINCT i FROM sym),",
        "v0 AS (",
        "  SELECT i AS d,",
        "         CAST(round(1e9 / sqrt((SELECT count(*) FROM dims)))",
        "              AS BIGINT) AS val",
        "  FROM dims",
        "),",
    ]
    parts += _pca_iter_parts("sym", "v0", "")
    return parts, f"v{_PCA_ITERS}"


def _pca_iter_parts(mat: str, start: str, tag: str) -> list[str]:
    """Unrolled iteration CTEs over matrix CTE ``mat`` starting from
    vector CTE ``start``; CTE names suffixed with ``tag`` so a second
    (deflated) chain can coexist in one statement."""
    parts: list[str] = []
    prev = start
    for k in range(1, _PCA_ITERS + 1):
        parts += [
            f"mv{tag}{k} AS MATERIALIZED (",
            "  SELECT s.i AS d, CAST(sum(s.c * v.val) AS BIGINT) AS val",
            f"  FROM {mat} s JOIN {prev} v ON s.j = v.d GROUP BY s.i",
            "),",
            f"n{tag}{k} AS (SELECT sqrt(CAST(sum(CAST(val AS HUGEINT) * val)"
            f" AS DOUBLE)) AS nrm FROM mv{tag}{k}),",
            f"v{tag}{k} AS MATERIALIZED (SELECT d,"
            " CAST(round(CAST(val AS DOUBLE) / nrm * 1e9) AS BIGINT) AS val"
            f" FROM mv{tag}{k} CROSS JOIN n{tag}{k}),",
        ]
        prev = f"v{tag}{k}"
    return parts


def _pca_oracle_sql() -> str:
    parts, prev = _pca_chain()
    parts += [
        "mvf AS (",
        "  SELECT s.i AS d, CAST(sum(s.c * v.val) AS BIGINT) AS val",
        f"  FROM sym s JOIN {prev} v ON s.j = v.d GROUP BY s.i",
        "),",
        "lam AS (",
        "  SELECT CAST(round(CAST(sum(CAST(v.val AS HUGEINT) * m.val)"
        " AS DOUBLE) / 1e20) AS BIGINT) / 1e6 AS l,",
        "         CAST(sum(CAST(v.val AS HUGEINT) * m.val) AS DOUBLE)"
        " AS lraw",
        f"  FROM {prev} v JOIN mvf m USING (d)",
        "),",
        "tr AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cint WHERE i = j)",
        "SELECT CAST(v.d AS INT) AS dim,",
        "       CAST(round(CAST(v.val AS DOUBLE) / 1000.0) AS BIGINT) / 1e6"
        " AS loading,",
        "       l AS eigenvalue,",
        "       CAST(round((lraw / 1e26) / (CAST(t AS DOUBLE) / 1e8) * 1e6)"
        " AS BIGINT) / 1e6 AS evr",
        f"FROM {prev} v CROSS JOIN lam CROSS JOIN tr",
        "ORDER BY dim",
    ]
    return "\n".join(parts)


PCA_POWER_SQL = _pca_oracle_sql()


def pca_project_embeddings(spark, sf_dir):
    """Project every embedding onto the top principal component
    (mean-centered): pc1 = <x, v> - <mean, v> — the whitening /
    drift-scoring read that turns the eigensolve into a per-vector
    feature. Loadings come from the same INTEGER power iteration as
    pca_power_iteration; the centering constant folds the per-dim
    means into one exact rational, so the per-row value is a single
    exact integer scaled at the end — no float accumulates anywhere
    (embeddings are exact 1e-6 integers by the corpus construction,
    the same property embedding_covariance exploits).

    Scale shape: the per-vector dot runs IN-ROW against the literal
    loadings vector (zip_with + aggregate, a codegen projection) — the
    embeddings are scanned once and NOTHING shuffles (the previous
    shape posexploded every vector twice: a d-way row blowup through
    two Exchanges, once for the column sums and once for a broadcast
    join + re-group). The centering constant needs no second pass at
    all: sum_d(col_sum_d * v_d) = sum_rows(<x, v>) = sum(dot_int), one
    tiny agg over the pinned dot table. Driver state is the d(d+1)/2
    covariance collect + two scalars, dimension-bounded."""
    cov_rows = embedding_covariance(spark, sf_dir).collect()
    if not cov_rows:  # empty corpus: nothing to project
        return spark.createDataFrame([], "vec_id long, pc1 double")
    v, _c, d = _power_iterate(cov_rows)
    emb = _t(spark, sf_dir, "embeddings")
    xi = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e6).cast("long"),
    )
    vlit = F.array(*[F.lit(int(x)).cast("long") for x in v])
    # exact int64 per-row dot (identical arithmetic to the old
    # posexplode+join+sum: same long products, same long summation
    # order within a row); pinned because two consumers read it (the
    # scalar agg and the final projection)
    dots = emb.select(
        "vec_id",
        F.aggregate(
            F.zip_with(xi, vlit, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        ).alias("dot_int"),
        # size(NULL) = -1: carried so the OUTPUT branch can drop
        # empty/NULL vectors exactly like the oracle's UNNEST (which
        # emits no proj row for them) while n still counts every
        # embedding row, matching the oracle's count(*) FROM emb
        F.size("embedding").alias("sz"),
    ).transform(pin, eager=False)
    row = dots.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulation: the Python-side sum it replaces was
        # arbitrary-precision, long could overflow at corpus scale.
        # NULL dots (NULL embeddings) are skipped by sum and empty
        # arrays contribute their aggregate seed 0 — both identical to
        # the oracle's c0, which they cannot reach either way.
        F.sum(F.col("dot_int").cast("decimal(38,0)")).alias("c0"),
    ).first()
    n = row["n"]
    c0_num = int(row["c0"]) if row["c0"] is not None else 0
    dot = dots.filter(F.col("sz") > 0)
    # pc1 = (dot_int*n - c0_num) / (n*1e15), rounded to 4 dp via the
    # integer grid: y2 = NUM / (n*1e11); pc1 = round0(y2)/1e4 — round
    # at 0 dp agrees between Spark (HALF_UP) and DuckDB (half away)
    # for every double, including exact .5
    num = F.col("dot_int").cast("decimal(38,0)") * F.lit(n) - F.lit(
        c0_num
    ).cast("decimal(38,0)")
    y2 = num.cast("double") / F.lit(float(n) * 1e11)
    return dot.select(
        "vec_id", (F.round(y2).cast("long") / F.lit(1e4)).alias("pc1")
    ).orderBy("vec_id")


def _pca_project_sql() -> str:
    parts, prev = _pca_chain()
    parts += [
        "emb AS MATERIALIZED (",
        "  SELECT vec_id,",
        "         list_transform(embedding,",
        "                        x -> CAST(round(x::DOUBLE * 1e6) AS BIGINT))"
        " AS v",
        "  FROM embeddings",
        "),",
        "colsums AS MATERIALIZED (",
        "  SELECT i.i AS d, CAST(sum(e.v[i.i + 1]) AS BIGINT) AS sd",
        "  FROM emb e, UNNEST(generate_series(0, len(e.v) - 1)) AS i(i)",
        "  GROUP BY 1",
        "),",
        "nn AS (SELECT count(*) AS n FROM emb),",
        "c0 AS (",
        "  SELECT CAST(sum(CAST(s.sd AS HUGEINT) * l.val) AS HUGEINT) AS cn",
        f"  FROM colsums s JOIN {prev} l USING (d)",
        "),",
        "proj AS (",
        "  SELECT e.vec_id, CAST(sum(e.v[i.i + 1] * l.val) AS BIGINT)"
        " AS dot_int",
        "  FROM emb e, UNNEST(generate_series(0, len(e.v) - 1)) AS i(i)",
        f"       JOIN {prev} l ON l.d = i.i",
        "  GROUP BY e.vec_id",
        ")",
        "SELECT vec_id,",
        "       CAST(round(CAST(CAST(dot_int AS HUGEINT) * n - cn AS DOUBLE)",
        "                  / (CAST(n AS DOUBLE) * 1e11)) AS BIGINT) / 1e4"
        " AS pc1",
        "FROM proj CROSS JOIN c0 CROSS JOIN nn",
        "ORDER BY vec_id",
    ]
    return "\n".join(parts)


PCA_PROJECT_SQL = _pca_project_sql()


def pca_top2_deflation(spark, sf_dir):
    """Top TWO principal components via Hotelling deflation: solve the
    first component, subtract lambda1 * v1 v1^T from the covariance,
    and power-iterate the deflated matrix — the standard route to a
    small top-k basis (whitening, 2-D corpus maps) without a full
    eigensolver. Emits (component, dim, loading, eigenvalue).

    The deflated matrix stays INTEGER: the rank-one correction is
    rounded to the covariance's own 1e-8 grid with a shared float
    expression evaluated on bit-identical inputs, so both engines
    iterate the identical deflated matrix (same discipline as
    _power_iterate). Scale shape: unchanged — one distributed
    covariance reduce; two driver-side O(d^2)-per-step solves under
    the documented dimension bound."""
    cov_rows = embedding_covariance(spark, sf_dir).collect()
    if not cov_rows:  # empty corpus: no components, not a crash
        return spark.createDataFrame(
            [], "component int, dim int, loading double, eigenvalue double"
        )
    v1, c, d = _power_iterate(cov_rows)

    def _lam_num(mat, vec):
        mvf = [
            sum(mat[i][j] * vec[j] for j in range(d)) for i in range(d)
        ]
        return sum(a * b for a, b in zip(vec, mvf))

    lam1_num = _lam_num(c, v1)
    lam1 = _iround(float(lam1_num) / 1e20) / 1e6
    lraw = float(lam1_num)
    c2 = [
        [
            c[i][j]
            - _iround(
                (lraw / 1e26) * (v1[i] / 1e9) * (v1[j] / 1e9) * 1e8
            )
            for j in range(d)
        ]
        for i in range(d)
    ]
    v2 = _iterate_matrix(c2, d)
    lam2 = _iround(float(_lam_num(c2, v2)) / 1e20) / 1e6
    rows = [
        (1, i, _iround(x / 1000.0) / 1e6, lam1) for i, x in enumerate(v1)
    ] + [
        (2, i, _iround(x / 1000.0) / 1e6, lam2) for i, x in enumerate(v2)
    ]
    return spark.createDataFrame(
        rows, "component int, dim int, loading double, eigenvalue double"
    ).orderBy("component", "dim")


def _pca_top2_sql() -> str:
    parts, prev = _pca_chain()
    parts += [
        "mvf1 AS (",
        "  SELECT s.i AS d, CAST(sum(s.c * v.val) AS BIGINT) AS val",
        f"  FROM sym s JOIN {prev} v ON s.j = v.d GROUP BY s.i",
        "),",
        "lam1 AS (",
        "  SELECT CAST(round(CAST(sum(CAST(v.val AS HUGEINT) * m.val)"
        " AS DOUBLE) / 1e20) AS BIGINT) / 1e6 AS l,",
        "         CAST(sum(CAST(v.val AS HUGEINT) * m.val) AS DOUBLE)"
        " AS lraw",
        f"  FROM {prev} v JOIN mvf1 m USING (d)",
        "),",
        "sym2 AS MATERIALIZED (",
        "  SELECT s.i, s.j,",
        "         s.c - CAST(round((l.lraw / 1e26) * (vi.val / 1e9)",
        "                          * (vj.val / 1e9) * 1e8) AS BIGINT) AS c",
        f"  FROM sym s JOIN {prev} vi ON vi.d = s.i",
        f"       JOIN {prev} vj ON vj.d = s.j CROSS JOIN lam1 l",
        "),",
        "vb0 AS (",
        "  SELECT i AS d,",
        "         CAST(round(1e9 / sqrt((SELECT count(*) FROM dims)))",
        "              AS BIGINT) AS val",
        "  FROM dims",
        "),",
        *_pca_iter_parts("sym2", "vb0", "b"),
        "mvf2 AS (",
        "  SELECT s.i AS d, CAST(sum(s.c * v.val) AS BIGINT) AS val",
        f"  FROM sym2 s JOIN vb{_PCA_ITERS} v ON s.j = v.d GROUP BY s.i",
        "),",
        "lam2 AS (",
        "  SELECT CAST(round(CAST(sum(CAST(v.val AS HUGEINT) * m.val)"
        " AS DOUBLE) / 1e20) AS BIGINT) / 1e6 AS l",
        f"  FROM vb{_PCA_ITERS} v JOIN mvf2 m USING (d)",
        ")",
        "SELECT 1 AS component, CAST(v.d AS INT) AS dim,",
        "       CAST(round(CAST(v.val AS DOUBLE) / 1000.0) AS BIGINT) / 1e6"
        " AS loading,",
        "       l.l AS eigenvalue",
        f"FROM {prev} v CROSS JOIN lam1 l",
        "UNION ALL",
        "SELECT 2 AS component, CAST(v.d AS INT) AS dim,",
        "       CAST(round(CAST(v.val AS DOUBLE) / 1000.0) AS BIGINT) / 1e6"
        " AS loading,",
        "       l.l AS eigenvalue",
        f"FROM vb{_PCA_ITERS} v CROSS JOIN lam2 l",
        "ORDER BY component, dim",
    ]
    return "\n".join(parts)


PCA_TOP2_SQL = _pca_top2_sql()

REGISTRY_ANALYTICS3 = {
    "incremental_agg_maintenance": QuerySpec(
        incremental_agg_maintenance, INCREMENTAL_AGG_SQL
    ),
    "pca_power_iteration": QuerySpec(pca_power_iteration, PCA_POWER_SQL),
    "pca_project_embeddings": QuerySpec(
        pca_project_embeddings, PCA_PROJECT_SQL
    ),
    "pca_top2_deflation": QuerySpec(pca_top2_deflation, PCA_TOP2_SQL),
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
