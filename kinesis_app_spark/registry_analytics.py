"""Analytics-extension queries: co-occurrence mining, record linkage,
rolling-window anomaly detection, bigram-LM scoring.

Each is the gate-sized instance of a scale-shaped operator:
co-occurrence = capped basket self-join (operators/baskets.py), linkage =
blocked candidate join + codegen levenshtein verify (operators/
linkage.py), anomalies = pure window frames, bigram LM = shared-shuffle
hash aggregates (operators/curation.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.operators import curation as CU
from kinesis_app_spark.operators.baskets import basket_pairs
from kinesis_app_spark.operators.intervals import interval_overlap_join
from kinesis_app_spark.operators.linkage import blocked_levenshtein_link
from kinesis_app_spark.registry_util import QuerySpec, table as _t


# =====================================================================
# co-occurrence: parts bought together
# =====================================================================

def cooccur_parts_in_orders(spark, sf_dir):
    """Top-20 part pairs co-occurring in the same order. Equi self-join on
    the order key with the triangle predicate as a post-join filter (hash
    join, never cartesian); max_basket_size=20 is a no-op on TPC-H data
    (max 7 lines/order) but caps the quadratic blowup a pathological
    basket would cause — semantics stated in basket_pairs' contract."""
    l = _t(spark, sf_dir, "lineitem")
    pairs = basket_pairs(
        l, basket_col="l_orderkey", item_col="l_partkey", max_basket_size=20
    )
    return pairs.orderBy(
        F.desc("n_baskets"), "item_a", "item_b"
    ).limit(20)


COOCCUR_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, count(*) AS n_baskets
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_baskets DESC, item_a, item_b
LIMIT 20
"""


# =====================================================================
# record linkage: dirty customer names vs the canonical table
# =====================================================================

def _dirty_customers(c):
    """Deterministic dirt on c_name ('Customer#' + 9 digits, positions
    10-18): custkey%10=7 corrupts two leading digit positions (edit
    distance 2 — must NOT link at max_dist=1), else custkey%3=0 corrupts
    one (distance 1 — must link), else clean (distance 0). Mirrored
    verbatim in the oracle SQL."""
    k = F.col("c_custkey")
    name = F.col("c_name")
    dirty = (
        F.when(
            k % 10 == 7,
            F.concat(F.substring(name, 1, 9), F.lit("XX"), F.substring(name, 12, 7)),
        )
        .when(
            k % 3 == 0,
            F.concat(F.substring(name, 1, 9), F.lit("X"), F.substring(name, 11, 8)),
        )
        .otherwise(name)
    )
    return c.select(F.col("c_custkey").alias("custkey"), dirty.alias("name"))


def record_linkage_customers(spark, sf_dir):
    """Link the dirtied customer list back to the canonical table: block on
    the last-5-digit substring (untouched by the dirt — block keys must be
    chosen to survive the noise), verify levenshtein <= 1. Distance-2
    records provide true negatives. Emits (custkey_l, custkey_r, dist) per
    linked pair."""
    c = _t(spark, sf_dir, "customer")
    dirty = _dirty_customers(c).withColumn(
        "block", F.substring("name", 14, 5)
    )
    clean = c.select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    ).withColumn("block", F.substring("name", 14, 5))
    linked = blocked_levenshtein_link(
        dirty, clean, ["block"], text_col="name", max_dist=1
    )
    return linked.select(
        F.col("custkey_l"), F.col("custkey_r"), F.col("dist").cast("int").alias("dist")
    ).orderBy("custkey_l", "custkey_r")


LINKAGE_SQL = """
WITH dirty AS (
  SELECT c_custkey AS custkey,
         CASE
           WHEN c_custkey % 10 = 7 THEN substr(c_name, 1, 9) || 'XX' || substr(c_name, 12, 7)
           WHEN c_custkey % 3 = 0 THEN substr(c_name, 1, 9) || 'X' || substr(c_name, 11, 8)
           ELSE c_name
         END AS name
  FROM customer
), clean AS (
  SELECT c_custkey AS custkey, c_name AS name FROM customer
)
SELECT d.custkey AS custkey_l, c.custkey AS custkey_r,
       CAST(levenshtein(d.name, c.name) AS INT) AS dist
FROM dirty d JOIN clean c ON substr(d.name, 14, 5) = substr(c.name, 14, 5)
WHERE levenshtein(d.name, c.name) <= 1
ORDER BY custkey_l, custkey_r
"""


# =====================================================================
# rolling-window anomaly detection
# =====================================================================

def anomaly_event_zscores(spark, sf_dir):
    """Events whose value is > 3 rolling standard deviations from the mean
    of the preceding 100 same-type events. NOT the naive bounded frame
    (avg/stddev OVER ROWS -100..-1): Spark's WindowExec re-aggregates a
    bounded frame per row, O(n x frame). Instead: running prefix sums of
    (d, d^2) + lag(cum, 1/101), so the rolling mean/variance are O(n)
    frame-sum differences — 3 Window nodes over ONE Exchange+Sort (same
    spec chains without re-sorting; check .explain). Values are shifted
    by the partition's first value before summing: z is shift-invariant,
    the cancellation in (ss - s^2/n) shrinks, and an exactly-constant
    series yields var == 0.0 exactly (excluded, never a NaN/noise z).
    The oracle runs the identical sequential-sum formula, so every double
    matches bit-for-bit. One shuffle on event_type; at scale, partition
    on (event_type, day) and carry the 100-row tail across boundaries."""
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wcum = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shifted = e.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        (F.col("value") - F.first("value").over(wcum)).alias("d"),
    )
    cums = shifted.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        "d",
        F.sum("d").over(wcum).alias("cum_s"),
        F.sum(F.col("d") * F.col("d")).over(wcum).alias("cum_ss"),
        F.row_number().over(wseq).alias("rn"),
    )
    n = F.least(F.col("rn") - 1, F.lit(100)).cast("double")
    s = F.lag("cum_s", 1, 0.0).over(wseq) - F.lag("cum_s", 101, 0.0).over(wseq)
    ss = F.lag("cum_ss", 1, 0.0).over(wseq) - F.lag("cum_ss", 101, 0.0).over(
        wseq
    )
    scored = cums.select(
        "event_id",
        "event_type",
        "value",
        "d",
        n.alias("n_prev"),
        s.alias("s"),
        ss.alias("ss"),
    )
    sigma = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n_prev"))
        / (F.col("n_prev") - 1)
    )
    z = (F.col("d") - F.col("s") / F.col("n_prev")) / sigma
    return (
        scored.filter(
            (F.col("n_prev") >= 30) & (sigma > 0) & (F.abs(z) > 3)
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 3).alias("z"),
        )
        .orderBy("event_id")
    )


ANOMALY_SQL = """
WITH shifted AS (
  SELECT event_id, event_type, ts, value,
         value - first_value(value) OVER w AS d
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
), cums AS (
  SELECT event_id, event_type, ts, value, d,
         sum(d) OVER w AS cum_s,
         sum(d * d) OVER w AS cum_ss,
         row_number() OVER w2 AS rn
  FROM shifted
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING),
         w2 AS (PARTITION BY event_type ORDER BY ts, event_id)
), scored AS (
  SELECT event_id, event_type, value, d,
         CAST(least(rn - 1, 100) AS DOUBLE) AS n_prev,
         lag(cum_s, 1, 0.0) OVER w2 - lag(cum_s, 101, 0.0) OVER w2 AS s,
         lag(cum_ss, 1, 0.0) OVER w2 - lag(cum_ss, 101, 0.0) OVER w2 AS ss
  FROM cums
  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_id, event_type, round(value, 4) AS value,
       round((d - s / n_prev) / sqrt((ss - s * s / n_prev) / (n_prev - 1)), 3)
         AS z
FROM scored
WHERE n_prev >= 30
  AND sqrt((ss - s * s / n_prev) / (n_prev - 1)) > 0
  AND abs((d - s / n_prev) / sqrt((ss - s * s / n_prev) / (n_prev - 1))) > 3
ORDER BY event_id
"""


# =====================================================================
# bigram-LM quality scores
# =====================================================================

def bigram_quality_scores(spark, sf_dir):
    """Mean add-0.5-smoothed bigram log-probability per document under the
    corpus's own bigram LM (operators/curation.bigram_logprob_scores)."""
    return CU.bigram_logprob_scores(_t(spark, sf_dir, "documents"))


BIGRAM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), big AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks,
       UNNEST(CASE WHEN len(t) >= 2 THEN generate_series(1, len(t)-1) ELSE [] END) AS g(i)
), bf AS (
  SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3
), bcnt AS (
  SELECT w1, w2, sum(tf) AS c12 FROM bf GROUP BY 1, 2
), ccnt AS (
  SELECT w1, sum(c12) AS c1 FROM bcnt GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT w1 AS tok FROM big UNION ALL SELECT w2 AS tok FROM big)
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_bigrams,
       round(sum(tf * (ln(c12 + 0.5) - ln(c1 + 0.5 * v))) / sum(tf), 3) AS logprob
FROM bf JOIN bcnt USING (w1, w2) JOIN ccnt USING (w1) CROSS JOIN vocab
GROUP BY doc_id
"""


# =====================================================================
# interval overlap join
# =====================================================================

def interval_overlap_events(spark, sf_dir):
    """Purchases whose 60 s activity window overlaps an error's 300 s
    incident window — grid-binned interval join (operators/intervals.py):
    equi-join on 300 s cells with the exact overlap predicate as a
    post-filter and shuffle-free cell-ownership dedup. The oracle is the
    plain theta join (DuckDB plans it as an IEJoin)."""
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id"),
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + 300).alias("end"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"),
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + 60).alias("end"),
    )
    out = interval_overlap_join(errors, purchases, cell_width=300)
    return out.select(
        F.col("id_a").alias("error_id"),
        F.col("id_b").alias("purchase_id"),
        (
            F.least(F.col("end_a"), F.col("end_b"))
            - F.greatest(F.col("start_a"), F.col("start_b"))
        ).alias("overlap_s"),
    ).orderBy("error_id", "purchase_id")


INTERVAL_SQL = """
WITH errors AS (
  SELECT event_id AS id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
  FROM events WHERE event_type = 'error'
), purchases AS (
  SELECT event_id AS id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 60 AS e
  FROM events WHERE event_type = 'purchase'
)
SELECT a.id AS error_id, b.id AS purchase_id,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_s
FROM errors a JOIN purchases b
  ON a.s < b.e AND b.s < a.e
ORDER BY error_id, purchase_id
"""


# =====================================================================
# deterministic weighted sampling (A-ES)
# =====================================================================

def weighted_sample_lineitem(spark, sf_dir):
    """1000-row Efraimidis–Spirakis weighted sample of lineitem, weight =
    l_quantity, u derived from md5 of the line id so the draw is
    reproducible and the DuckDB oracle computes the *identical* sample.
    Plans as TakeOrderedAndProject — no global sort."""
    from kinesis_app_spark.operators.sampling import weighted_sample

    l = _t(spark, sf_dir, "lineitem")
    sampled = weighted_sample(
        l,
        id_str=F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")),
        weight=F.col("l_quantity"),
        k=1000,
        tiebreak=["l_orderkey", "l_linenumber"],
    )
    return sampled.select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("qty")
    ).orderBy("l_orderkey", "l_linenumber")


WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         power(
           CAST(concat('0x', substr(md5(l_orderkey || '-' || l_linenumber), 1, 8)) AS BIGINT)
             / 4294967296.0,
           1.0 / l_quantity
         ) AS key
  FROM lineitem
  WHERE l_quantity > 0
)
SELECT l_orderkey, l_linenumber, l_quantity::DOUBLE AS qty
FROM keyed
ORDER BY key DESC, l_orderkey, l_linenumber
LIMIT 1000
"""
# outer ORDER BY of the entry is applied by the gate's value-hash
# (order-insensitive), so the LIMIT subquery's ordering is what matters


# =====================================================================
# cumulative distinct users (first-touch rewrite)
# =====================================================================

def cumulative_distinct_users(spark, sf_dir):
    """Running count of distinct users ever seen, per day. Spark has no
    COUNT(DISTINCT) OVER (ORDER BY …), and a naive per-day distinct-union
    is quadratic; the scale rewrite is **first-touch**: each user
    contributes only on their first day (one groupBy user), then a
    cumulative sum over the tiny per-day new-user counts. Two shuffles
    total, both on small keys, regardless of corpus size."""
    e = _t(spark, sf_dir, "events")
    first = (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily_new = first.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily_new.select(
            F.col("first_day").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("distinct_users_to_date"),
        )
        .orderBy("day")
    )


CUMULATIVE_DISTINCT_SQL = """
WITH first AS (
  SELECT user_id, min(date_trunc('day', ts)) AS first_day FROM events GROUP BY 1
), daily AS (
  SELECT first_day AS day, count(*) AS new_users FROM first GROUP BY 1
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS distinct_users_to_date
FROM daily
ORDER BY day
"""


# =====================================================================
# data-quality expectations
# =====================================================================

def dq_expectations_orders(spark, sf_dir):
    """dbt-style data-quality expectation suite over orders, evaluated in
    ONE scan: every check is a conditional count in the same aggregate
    (count_if), so N expectations cost one pass, not N. Referential
    integrity (orders -> customer) is a broadcast anti-join counted in the
    same job."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    checks = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_orderkey").isNull()).alias("null_orderkey"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpositive_totalprice"),
        F.count_if(
            ~F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("bad_status"),
        F.count_if(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date"))
        ).alias("date_out_of_range"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
            "duplicate_orderkeys"
        ),
    )
    orphans = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphan_custkeys"))
    )
    return checks.crossJoin(F.broadcast(orphans))


DQ_SQL = """
SELECT
  (SELECT count(*) FROM orders) AS n_rows,
  (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS null_orderkey,
  (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS nonpositive_totalprice,
  (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P')) AS bad_status,
  (SELECT count(*) FROM orders
     WHERE o_orderdate < DATE '1992-01-01' OR o_orderdate > DATE '1998-12-31')
    AS date_out_of_range,
  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS duplicate_orderkeys,
  (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
     WHERE c.c_custkey IS NULL) AS orphan_custkeys
"""


REGISTRY_ANALYTICS = {
    "cooccur_parts_in_orders": QuerySpec(cooccur_parts_in_orders, COOCCUR_SQL),
    "record_linkage_customers": QuerySpec(record_linkage_customers, LINKAGE_SQL),
    "anomaly_event_zscores": QuerySpec(anomaly_event_zscores, ANOMALY_SQL),
    "bigram_quality_scores": QuerySpec(bigram_quality_scores, BIGRAM_SQL),
    "interval_overlap_events": QuerySpec(interval_overlap_events, INTERVAL_SQL),
    "weighted_sample_lineitem": QuerySpec(weighted_sample_lineitem, WEIGHTED_SAMPLE_SQL),
    "cumulative_distinct_users": QuerySpec(
        cumulative_distinct_users, CUMULATIVE_DISTINCT_SQL
    ),
    "dq_expectations_orders": QuerySpec(dq_expectations_orders, DQ_SQL),
}
