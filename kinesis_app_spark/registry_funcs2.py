"""Second operator battery: conditional aggregates, median, bucketing,
regexp extraction, safe casts, deterministic sampling, and lateral joins.

Same conventions as registry_funcs.py — JVM-side Column algebra only,
scalar output columns, every query oracle-checked against DuckDB. These
fill §2.2 "scalar functions / aggregations" rows the first battery left
uncovered (the reference computes none of these — its only computation
surface is the opaque Processor callback, src/Kinesis/Coordination.hs:51-53).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t


# ---------------------------------------------------------------------
# conditional / boolean aggregates + exact median
# ---------------------------------------------------------------------

def conditional_aggregates(spark, sf_dir):
    """count_if / bool_or / bool_and / every + exact median per event type.
    All are single-pass partial+final hash aggregates except median (sort
    agg); at 100 TB swap median for percentile_approx."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("count_if(value > 50.0)").alias("n_high"),
        F.expr("bool_or(value > 99.0)").alias("any_extreme"),
        F.expr("bool_and(value >= 0.0)").alias("all_nonneg"),
        F.round(F.expr("median(value)"), 4).alias("med_value"),
    )


CONDITIONAL_AGG_SQL = """
SELECT event_type,
       count(CASE WHEN value > 50.0 THEN 1 END) AS n_high,
       bool_or(value > 99.0)  AS any_extreme,
       bool_and(value >= 0.0) AS all_nonneg,
       round(median(value), 4) AS med_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------
# width_bucket histogram
# ---------------------------------------------------------------------

def value_histogram(spark, sf_dir):
    """Fixed-bound 10-bucket histogram of event values via width_bucket —
    one scan, one shuffle on the (tiny) bucket key."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(100.0), F.lit(10))
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


HISTOGRAM_SQL = """
SELECT CASE WHEN value < 0 THEN 0
            WHEN value >= 100 THEN 11
            ELSE CAST(floor(value / 10.0) AS INT) + 1 END AS bucket,
       count(*) AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------
# regexp extraction / counting
# ---------------------------------------------------------------------

def regexp_battery(spark, sf_dir):
    """Pattern extraction over document text: per-doc match counts from
    regexp_extract_all plus first-match capture — all codegen'd JVM regex,
    embarrassingly parallel (no shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\d+"), F.lit(0)))
        .cast("int")
        .alias("n_numbers"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Z][a-z]+"), F.lit(0)))
        .cast("int")
        .alias("n_capitalized"),
        F.regexp_extract(F.col("text"), r"(\d+)", 1).alias("first_number"),
        F.col("text").rlike(r"\d").alias("has_digit"),
    )


REGEXP_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\d+'))      AS n_numbers,
       len(regexp_extract_all(text, '[A-Z][a-z]+')) AS n_capitalized,
       coalesce(regexp_extract(text, '(\d+)', 1), '') AS first_number,
       regexp_matches(text, '\d') AS has_digit
FROM documents
"""


# ---------------------------------------------------------------------
# safe casts / try arithmetic
# ---------------------------------------------------------------------

def try_cast_battery(spark, sf_dir):
    """Null-on-error casts and division: the ingestion-hardening path for
    dirty data (a 100 TB load can't abort on one malformed row)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
        .try_cast("long")
        .alias("prio_num"),
        F.expr("try_divide(o_totalprice, o_custkey % 3)").alias("maybe_div"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_int"),
    )


TRY_CAST_SQL = """
SELECT o_orderkey,
       TRY_CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS prio_num,
       CASE WHEN o_custkey % 3 = 0 THEN NULL
            ELSE o_totalprice / (o_custkey % 3) END AS maybe_div,
       TRY_CAST(o_orderstatus AS INT) AS bad_int
FROM orders
"""


# ---------------------------------------------------------------------
# split_part / string slicing
# ---------------------------------------------------------------------

def split_part_battery(spark, sf_dir):
    """Delimited-field extraction from priority codes (split_part / left /
    right / translate) — pure codegen, no shuffle."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).alias("prio_rank"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(-1)).alias("prio_word"),
        F.expr("left(o_orderpriority, 1)").alias("prio_code"),
        F.expr("right(o_orderstatus, 1)").alias("status_tail"),
        F.translate(F.col("o_orderpriority"), "-", " ").alias("prio_spaced"),
    )


SPLIT_PART_SQL = """
SELECT o_orderkey,
       split_part(o_orderpriority, '-', 1)  AS prio_rank,
       split_part(o_orderpriority, '-', -1) AS prio_word,
       left(o_orderpriority, 1)     AS prio_code,
       right(o_orderstatus, 1)      AS status_tail,
       translate(o_orderpriority, '-', ' ') AS prio_spaced
FROM orders
"""


# ---------------------------------------------------------------------
# deterministic systematic sampling
# ---------------------------------------------------------------------

def systematic_sample_stats(spark, sf_dir):
    """1-in-10 systematic sample by key residue, then aggregate. The
    deterministic cousin of TABLESAMPLE: reproducible across engines and
    retries (a random Bernoulli sample can't be oracle-checked). The modulo
    filter is pushed into the scan; at 100 TB this reads every row-group but
    only materializes the sample."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")), 2
        ).cast("double").alias("sum_price"),
    )


SYSTEMATIC_SAMPLE_SQL = """
SELECT o_orderstatus,
       count(*) AS n_sampled,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey % 10 = 0
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------
# SQL LATERAL join
# ---------------------------------------------------------------------

def sql_lateral_topk(spark, sf_dir):
    """Per-nation top-3 customers by balance via a correlated LATERAL
    subquery — Catalyst decorrelates it to a ranked window join, the same
    plan top_k_per_group builds by hand."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_v n,
             LATERAL (
               SELECT c_name, c_acctbal
               FROM customer_v c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name
               LIMIT 3
             ) t
        """
    )


SQL_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
     LATERAL (
       SELECT c_name, c_acctbal
       FROM customer c
       WHERE c.c_nationkey = n.n_nationkey
       ORDER BY c_acctbal DESC, c_name
       LIMIT 3
     ) t
"""


def union_by_name_mismatched(spark, sf_dir):
    """Schema-evolution-style union: two projections with different column
    sets combined with ``unionByName(allowMissingColumns=True)`` — the
    DataFrame surface for UNION ALL BY NAME. Missing columns null-fill;
    column ORDER differs between the inputs on purpose (position-based
    union would silently mis-align). Zero-shuffle: a union is just a
    logical concatenation of scans."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").alias("price"),
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        "o_custkey",
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("o_custkey").agg(
        F.count("*").alias("n_rows"),
        F.count("price").alias("n_priced"),
        F.count("priority").alias("n_prioritized"),
        F.round(F.sum(F.col("price").cast("decimal(30,8)")), 2)
        .cast("double")
        .alias("price_sum"),
    ).orderBy("o_custkey")


UNION_BY_NAME_SQL = """
WITH u AS (
  SELECT o_orderkey, o_custkey, o_totalprice AS price, NULL AS priority
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL BY NAME
  SELECT o_orderpriority AS priority, o_orderkey, o_custkey
  FROM orders WHERE o_orderstatus = 'O'
)
SELECT o_custkey,
       count(*) AS n_rows,
       count(price) AS n_priced,
       count(priority) AS n_prioritized,
       CAST(round(sum(CAST(price AS DECIMAL(30,8))), 2) AS DOUBLE) AS price_sum
FROM u
GROUP BY o_custkey
ORDER BY o_custkey
"""


def window_distribution_family(spark, sf_dir):
    """The distribution window functions — percent_rank, cume_dist,
    ntile — over order totals within each priority class. The window
    ORDER BY carries a full tie-break (totalprice, orderkey) so every
    rank-derived value is deterministic; percent_rank/cume_dist are exact
    rational ratios of row positions, rounded at 6. One shuffle on the
    partition key, all four functions ride the same sort."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.ntile(7).over(w).alias("septile"),
        F.row_number().over(w).alias("rn"),
    ).orderBy("o_orderpriority", "rn")


WINDOW_DIST_SQL = """
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume_dist,
       CAST(ntile(7) OVER w AS INTEGER) AS septile,
       CAST(row_number() OVER w AS INTEGER) AS rn
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC)
ORDER BY o_orderpriority, rn
"""


def string_agg_rich_customers(spark, sf_dir):
    """Ordered string aggregation (SQL:2016 LISTAGG ... WITHIN GROUP,
    native in Spark 4): per nation, the comma-joined names of customers
    with acctbal > 9900 in custkey order, plus their count. The WITHIN
    GROUP ordering is what makes the concatenation deterministic — an
    unordered listagg is run-dependent under parallel aggregation."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    n = _t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    j.createOrReplaceTempView("rich_customers_v")
    return spark.sql(
        """
        SELECT n_name AS nation,
               count(*) AS n_rich,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey) AS names
        FROM rich_customers_v
        GROUP BY n_name
        ORDER BY n_name
        """
    )


STRING_AGG_SQL = """
SELECT n.n_name AS nation,
       count(*) AS n_rich,
       string_agg(c.c_name, ',' ORDER BY c.c_custkey) AS names
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 9900
GROUP BY n.n_name
ORDER BY n.n_name
"""


def grouping_labels_rollup(spark, sf_dir):
    """ROLLUP with GROUPING() level labels — the function that tells a
    report row from a subtotal row (a NULL group key is ambiguous:
    grouping() disambiguates data-NULL from rollup-NULL). Emits the
    grouping bits and a derived level name; single rollup aggregate."""
    o = _t(spark, sf_dir, "orders")
    g_status = F.grouping("o_orderstatus").cast("int")
    g_prio = F.grouping("o_orderpriority").cast("int")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            g_status.alias("g_status"),
            g_prio.alias("g_prio"),
            F.when(g_status + g_prio == 0, F.lit("detail"))
            .when((g_status == 0) & (g_prio == 1), F.lit("status_subtotal"))
            .otherwise(F.lit("grand_total"))
            .alias("level"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


GROUPING_LABELS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
       CASE WHEN grouping(o_orderstatus) + grouping(o_orderpriority) = 0
              THEN 'detail'
            WHEN grouping(o_orderstatus) = 0 AND grouping(o_orderpriority) = 1
              THEN 'status_subtotal'
            ELSE 'grand_total' END AS level
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


def table_profile_orders(spark, sf_dir):
    """Column-profile report (the ops `describe` a data platform runs on
    every ingest): per column — nulls, distincts, min/max as strings,
    and total rows. One aggregate computes every statistic in a single
    scan; the per-column rows unpivot from that 1-row result (same
    single-pass discipline as the Pearson matrix)."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"mx_{c}"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("p")).select("p.*").orderBy("column")
    )


TABLE_PROFILE_SQL = """
WITH s AS (
  SELECT count(*) AS n_rows,
         count(o_orderkey) AS nn_k, count(DISTINCT o_orderkey) AS nd_k,
         min(CAST(o_orderkey AS VARCHAR)) AS mn_k, max(CAST(o_orderkey AS VARCHAR)) AS mx_k,
         count(o_custkey) AS nn_c, count(DISTINCT o_custkey) AS nd_c,
         min(CAST(o_custkey AS VARCHAR)) AS mn_c, max(CAST(o_custkey AS VARCHAR)) AS mx_c,
         count(o_orderstatus) AS nn_s, count(DISTINCT o_orderstatus) AS nd_s,
         min(CAST(o_orderstatus AS VARCHAR)) AS mn_s, max(CAST(o_orderstatus AS VARCHAR)) AS mx_s,
         count(o_totalprice) AS nn_t, count(DISTINCT o_totalprice) AS nd_t,
         min(CAST(o_totalprice AS VARCHAR)) AS mn_t, max(CAST(o_totalprice AS VARCHAR)) AS mx_t,
         count(o_orderpriority) AS nn_p, count(DISTINCT o_orderpriority) AS nd_p,
         min(CAST(o_orderpriority AS VARCHAR)) AS mn_p, max(CAST(o_orderpriority AS VARCHAR)) AS mx_p
  FROM orders
)
SELECT u.* FROM s, LATERAL (
  SELECT 'o_orderkey' AS "column", n_rows, n_rows - nn_k AS n_nulls,
         nd_k AS n_distinct, mn_k AS min_str, mx_k AS max_str
  UNION ALL
  SELECT 'o_custkey', n_rows, n_rows - nn_c, nd_c, mn_c, mx_c
  UNION ALL
  SELECT 'o_orderstatus', n_rows, n_rows - nn_s, nd_s, mn_s, mx_s
  UNION ALL
  SELECT 'o_totalprice', n_rows, n_rows - nn_t, nd_t, mn_t, mx_t
  UNION ALL
  SELECT 'o_orderpriority', n_rows, n_rows - nn_p, nd_p, mn_p, mx_p
) u
ORDER BY "column"
"""


REGISTRY_FUNCS2 = {
    "table_profile_orders": QuerySpec(table_profile_orders, TABLE_PROFILE_SQL),
    "grouping_labels_rollup": QuerySpec(
        grouping_labels_rollup, GROUPING_LABELS_SQL
    ),
    "union_by_name_mismatched": QuerySpec(
        union_by_name_mismatched, UNION_BY_NAME_SQL
    ),
    "window_distribution_family": QuerySpec(
        window_distribution_family, WINDOW_DIST_SQL
    ),
    "string_agg_rich_customers": QuerySpec(
        string_agg_rich_customers, STRING_AGG_SQL
    ),
    "conditional_aggregates": QuerySpec(conditional_aggregates, CONDITIONAL_AGG_SQL),
    "value_histogram": QuerySpec(value_histogram, HISTOGRAM_SQL),
    "regexp_battery": QuerySpec(regexp_battery, REGEXP_SQL),
    "try_cast_battery": QuerySpec(try_cast_battery, TRY_CAST_SQL),
    "split_part_battery": QuerySpec(split_part_battery, SPLIT_PART_SQL),
    "systematic_sample_stats": QuerySpec(systematic_sample_stats, SYSTEMATIC_SAMPLE_SQL),
    "sql_lateral_topk": QuerySpec(sql_lateral_topk, SQL_LATERAL_SQL),
}
