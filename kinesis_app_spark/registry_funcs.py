"""Operator batteries: pivot/unpivot, statistical aggregates, array / map /
string / date function coverage, extra window frames, cross join, SQL scalar
subqueries, and the Python boundary (pandas UDFs, applyInPandas, UDTF).

Everything stays JVM-side Column algebra except the three queries whose
*point* is the Arrow-batched Python path (SURVEY.md §2.2 UDF/UDAF/UDTF row —
the reference's only computation surface is a user callback,
src/Kinesis/Coordination.hs:51-53, so the UDF path is its direct engine
equivalent, upgraded from row-at-a-time to Arrow batches).

Output-shape convention: no array/map columns in results (the oracle compare
sorts rows by every column, which needs scalars) — arrays are surfaced via
explode or reduced to scalars.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.functions.text import tokens
from kinesis_app_spark.registry_util import QuerySpec, table as _t

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------
# pivot / unpivot
# ---------------------------------------------------------------------

def pivot_monthly_event_counts(spark, sf_dir):
    """Wide month x event_type count matrix. Explicit pivot values keep the
    plan a single shuffle (no extra distinct-scan to discover columns) and a
    stable schema — required at scale and for streaming parity."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy(F.date_trunc("month", F.col("ts")).alias("month"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.fillna(0, subset=EVENT_TYPES)


PIVOT_SQL = """
SELECT date_trunc('month', ts) AS month,
       sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::BIGINT AS click,
       sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::BIGINT AS error,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
       sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::BIGINT AS signup,
       sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::BIGINT AS view
FROM events GROUP BY 1
"""


def unpivot_customer_metrics(spark, sf_dir):
    """Wide-to-long melt of two customer measures (Spark's native unpivot —
    a per-row expand, no shuffle)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


UNPIVOT_SQL = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal::DOUBLE AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey', c_nationkey::DOUBLE FROM customer
"""


# ---------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------

def stats_aggregates(spark, sf_dir):
    """The standard-deviation/variance/correlation family per event_type —
    all single-pass partial+final hash aggregates."""
    e = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("value"), 4).alias("sd_pop"),
        F.round(F.var_samp("value"), 4).alias("var_samp"),
        F.round(F.var_pop("value"), 4).alias("var_pop"),
        F.round(F.corr("value", "k"), 4).alias("corr_vk"),
        F.round(F.covar_samp("value", "k"), 4).alias("covar_samp_vk"),
        F.round(F.covar_pop("value", "k"), 4).alias("covar_pop_vk"),
    )


STATS_SQL = """
SELECT event_type,
       round(stddev_samp(value), 4)  AS sd_samp,
       round(stddev_pop(value), 4)   AS sd_pop,
       round(var_samp(value), 4)     AS var_samp,
       round(var_pop(value), 4)      AS var_pop,
       round(corr(value, k), 4)      AS corr_vk,
       round(covar_samp(value, k), 4) AS covar_samp_vk,
       round(covar_pop(value, k), 4)  AS covar_pop_vk
FROM (SELECT event_type, value,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
      FROM events)
GROUP BY event_type
"""


def percentile_aggregates(spark, sf_dir):
    """Exact interpolated percentiles (median/p90/p99) — a sort-based
    aggregate; at 100 TB prefer approx_percentile (t-digest sketch), kept
    here exact so the oracle can check it."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


PERCENTILE_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.9), 4)  AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def minmax_by_aggregates(spark, sf_dir):
    """Argmin/argmax: the event carrying each type's extreme value."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("max_by(event_id, value)").alias("max_value_event"),
        F.expr("min_by(event_id, value)").alias("min_value_event"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.min("value"), 4).alias("min_value"),
    )


MINMAX_BY_SQL = """
SELECT event_type,
       max_by(event_id, value) AS max_value_event,
       min_by(event_id, value) AS min_value_event,
       round(max(value), 4) AS max_value,
       round(min(value), 4) AS min_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------
# array / map / explode
# ---------------------------------------------------------------------

def array_functions_battery(spark, sf_dir):
    """Per-document token-array algebra (size/sort/slice/contains/distinct)
    reduced to scalar outputs — all whole-stage-codegen expressions."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.element_at(F.array_sort(toks), 1).alias("min_token"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


ARRAY_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       toks[1] AS first_token,
       toks[-1] AS last_token,
       list_sort(toks)[1] AS min_token,
       list_contains(toks, 'the') AS has_the,
       array_to_string(toks[1:3], ' ') AS first3
FROM t
"""


def map_entries_from_json(spark, sf_dir):
    """props JSON -> map<string,bigint> -> exploded (key, value) rows: the
    schema-on-read path for semi-structured payloads (the reference's opaque
    blob made relational)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select("event_id", F.explode(m).alias("key", "val"))


MAP_ENTRIES_SQL = """
SELECT event_id, k AS key,
       CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS val
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
      FROM events WHERE event_id < 5000)
"""


def explode_wordcount(spark, sf_dir):
    """The canonical explode -> groupBy wordcount over documents (shuffle
    moves (token, partial-count), not text)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


WORDCOUNT_SQL = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
      FROM documents)
GROUP BY token HAVING count(*) >= 5
"""


def posexplode_tokens(spark, sf_dir):
    """Ordinal-preserving explode (posexplode) — first 5 tokens per doc."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        d.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
        .filter(F.col("pos") < 5)
        .withColumn("pos", F.col("pos").cast("int"))
    )


POSEXPLODE_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
FROM t, unnest(range(1, least(len(toks), 5) + 1)) AS u(i)
"""


# ---------------------------------------------------------------------
# string / date function batteries
# ---------------------------------------------------------------------

def string_functions_battery(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.substring("text", 1, 10)).alias("rev_head"),
        F.instr(F.col("text"), "the").cast("int").alias("the_pos"),
        F.levenshtein("lang", "source").cast("int").alias("lev_lang_src"),
        F.concat_ws("-", "lang", "source").alias("lang_src"),
        F.repeat(F.col("lang"), 2).alias("lang2"),
        F.ascii(F.substring("text", 1, 1)).cast("int").alias("first_ascii"),
        F.length("text").cast("int").alias("n_chars"),
        F.substring_index(F.col("text"), " ", 2).alias("first2_words"),
    )


STRING_SQL = """
SELECT doc_id,
       lpad(doc_id::VARCHAR, 8, '0') AS padded_id,
       reverse(substr(text, 1, 10)) AS rev_head,
       CAST(strpos(text, 'the') AS INTEGER) AS the_pos,
       CAST(levenshtein(lang, source) AS INTEGER) AS lev_lang_src,
       concat_ws('-', lang, source) AS lang_src,
       repeat(lang, 2) AS lang2,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_ascii,
       CAST(length(text) AS INTEGER) AS n_chars,
       CASE WHEN len(string_split(text, ' ')) <= 2 THEN text
            ELSE array_to_string(string_split(text, ' ')[1:2], ' ') END AS first2_words
FROM documents
"""


def date_functions_battery(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        (F.dayofweek("o_orderdate")).cast("int").alias("dow_sun1"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch0"),
        F.add_months("o_orderdate", 2).cast("timestamp").alias("plus2m"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


DATE_SQL = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch0,
       o_orderdate + INTERVAL 2 MONTH AS plus2m,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders WHERE o_orderkey < 2000
"""


# ---------------------------------------------------------------------
# window frames: RANGE, rank family
# ---------------------------------------------------------------------

def window_range_frame(spark, sf_dir):
    """Trailing 1-hour sum per user via a RANGE frame over epoch seconds —
    the time-decayed-metric pattern; one shuffle on user_id."""
    e = _t(spark, sf_dir, "events").withColumn(
        "epoch_s", F.col("ts").cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


WINDOW_RANGE_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 4) AS trailing_1h_sum,
       count(*) OVER w AS trailing_1h_n
FROM (SELECT event_id, user_id, value, epoch(ts)::BIGINT AS epoch_s FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def window_rank_family(spark, sf_dir):
    """percent_rank / cume_dist / dense_rank / nth_value over a total order
    (unique tiebreak => deterministic across engines)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("dr"),
        F.round(
            F.nth_value("value", 2).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            4,
        ).alias("second_value"),
    )


WINDOW_RANK_SQL = """
SELECT event_id, user_id,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(dense_rank() OVER w AS BIGINT) AS dr,
       round(nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS second_value
FROM events WHERE user_id < 200
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------
# cross join / SQL scalar subquery
# ---------------------------------------------------------------------

def cross_join_region_nation(spark, sf_dir):
    """Explicit cartesian of two tiny dims (BroadcastNestedLoop; a plan
    only sane when one side is broadcastable)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


CROSS_SQL = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def sql_scalar_subquery(spark, sf_dir):
    """SQL-surface scalar subquery (uncorrelated) — Catalyst plans the
    subquery once and broadcasts the scalar."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ssq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM ssq_orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM ssq_orders)
        """
    )


SQL_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
"""


# ---------------------------------------------------------------------
# Python boundary: pandas UDFs / applyInPandas / UDTF
# ---------------------------------------------------------------------

def pandas_zscore_per_type(spark, sf_dir):
    """Grouped z-score via applyInPandas — the Arrow-batched stateful-ish
    per-group transform (each group becomes one pandas DataFrame). This is
    the engine's 'user processor' surface for logic Column algebra can't
    express; here it IS expressible, so the oracle can check the plumbing."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "z": ((pdf["value"] - mu) / sd).round(4),
            }
        )

    return e.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


PANDAS_ZSCORE_SQL = """
SELECT event_id, event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
FROM events
"""


def pandas_sigmoid_scores(spark, sf_dir):
    """Scalar pandas UDF (Arrow-vectorized, numpy inside) — per-row math at
    ~batch granularity, the 10-100x-over-row-UDF path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        return (1.0 / (1.0 + np.exp(-v / 100.0))).round(6)

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    return e.select("event_id", sigmoid(F.col("value")).alias("sig"))


PANDAS_SIGMOID_SQL = """
SELECT event_id, round(1.0 / (1.0 + exp(-value / 100.0)), 6) AS sig
FROM events WHERE event_id < 20000
"""


def pandas_grouped_agg_geomean(spark, sf_dir):
    """Grouped-aggregate pandas UDF (the UDAF surface): geometric mean of
    positive values per event type — one Arrow batch per group feeds a
    numpy reduction."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.round(np.exp(np.log(v).mean()), 4))

    e = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    return e.groupBy("event_type").agg(geomean(F.col("value")).alias("geo_mean"))


PANDAS_GEOMEAN_SQL = """
SELECT event_type, round(exp(avg(ln(value))), 4) AS geo_mean
FROM events WHERE value > 0
GROUP BY event_type
"""


def outer_join_battery(spark, sf_dir):
    """Full outer join with unmatched rows on both sides (high-balance
    customers vs high-value orders), null-flagged."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_acctbal"
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 490000).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal"),
        F.col("o_orderkey"),
        F.col("c_custkey").isNull().alias("cust_missing"),
        F.col("o_orderkey").isNull().alias("order_missing"),
    )


OUTER_JOIN_SQL = """
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       c_acctbal, o_orderkey,
       c_custkey IS NULL AS cust_missing,
       o_orderkey IS NULL AS order_missing
FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice
                 FROM orders WHERE o_totalprice > 490000) o
  ON c_custkey = o_custkey
"""


def setop_intersect_all(spark, sf_dir):
    """Multiset INTERSECT ALL — duplicates preserved up to the min
    multiplicity (vs the distinct variant elsewhere in the registry)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


SETOP_INTERSECT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


def setop_except_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


SETOP_EXCEPT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
"""


def null_handling_battery(spark, sf_dir):
    """coalesce / nullif / null-safe equality / null flags."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    open_price = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.select(
        "o_orderkey",
        open_price.alias("status_or_null"),
        F.coalesce(open_price, F.lit("CLOSED")).alias("status_filled"),
        open_price.isNull().alias("is_finished"),
        F.col("o_orderstatus").eqNullSafe(F.lit("F")).alias("finished_nullsafe"),
        F.when(F.col("o_totalprice") > 250000, F.col("o_totalprice")).alias(
            "big_price_or_null"
        ),
    )


NULL_HANDLING_SQL = """
SELECT o_orderkey,
       nullif(o_orderstatus, 'F') AS status_or_null,
       coalesce(nullif(o_orderstatus, 'F'), 'CLOSED') AS status_filled,
       nullif(o_orderstatus, 'F') IS NULL AS is_finished,
       o_orderstatus IS NOT DISTINCT FROM 'F' AS finished_nullsafe,
       CASE WHEN o_totalprice > 250000 THEN o_totalprice END AS big_price_or_null
FROM orders WHERE o_orderkey < 3000
"""


def collect_set_sorted(spark, sf_dir):
    """Set-valued aggregation surfaced deterministically: collect_set is
    unordered, so results are sorted then joined before leaving the engine
    (array columns stay deterministic and hash-comparable)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.size(F.collect_set("c_mktsegment")).cast("int").alias("n_segments"),
    )


COLLECT_SET_SQL = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       CAST(count(DISTINCT c_mktsegment) AS INTEGER) AS n_segments
FROM customer
GROUP BY c_nationkey
"""


def udtf_sentence_split(spark, sf_dir):
    """Python UDTF (table function): one input doc row -> N sentence rows.
    The UDTF surface generalizes the reference's record->callback model to
    record->rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register("udtf_sentence_split", SentenceSplit)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence
        FROM udtf_docs, LATERAL udtf_sentence_split(text) s
        """
    )


UDTF_SQL = """
WITH t AS (SELECT doc_id, string_split(text, '. ') AS parts
           FROM documents WHERE doc_id < 50)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS sent_idx, parts[i] AS sentence
FROM t, unnest(range(1, len(parts) + 1)) AS u(i)
"""


def text_winnow_fingerprints(spark, sf_dir):
    from kinesis_app_spark.operators.textanalysis import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    )


WINNOW_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents WHERE doc_id < 300
), pos AS (
  SELECT doc_id, i,
         md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)
)
SELECT doc_id, CAST((i - 1) // 4 AS BIGINT) AS bucket, min(h) AS fp
FROM pos GROUP BY 1, 2
"""


def bitwise_aggregates(spark, sf_dir):
    """bit_and / bit_or / bit_xor aggregates over the JSON-extracted k."""
    e = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return e.groupBy("event_type").agg(
        F.bit_and("k").alias("k_and"),
        F.bit_or("k").alias("k_or"),
        F.bit_xor("k").alias("k_xor"),
    )


BITWISE_SQL = """
SELECT event_type, bit_and(k) AS k_and, bit_or(k) AS k_or, bit_xor(k) AS k_xor
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


def timeseries_resample_daily(spark, sf_dir):
    from kinesis_app_spark.operators.timeseries import resample_daily

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return resample_daily(e, key="user_id", ts="ts", value="value")


RESAMPLE_SQL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         count(*) AS n_events, round(sum(value), 2) AS value_sum
  FROM events WHERE user_id < 100
  GROUP BY 1, 2
), scaffold AS (
  SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily GROUP BY user_id
)
SELECT s.user_id, s.day,
       coalesce(d.n_events, 0) AS n_events,
       coalesce(d.value_sum, 0.0) AS value_sum
FROM scaffold s LEFT JOIN daily d USING (user_id, day)
"""


def vector_mean_per_label(spark, sf_dir):
    """Element-wise mean embedding per label (the centroid computation) —
    posexplode to (label, dim, x), groupBy avg, reassembled in dim order.
    Emitted as exploded (label, dim, mean) rows so the oracle can compare
    scalar values."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("mean_x"))
        .withColumn("dim", F.col("dim").cast("int"))
    )


VECTOR_MEAN_SQL = """
SELECT label, CAST(dim - 1 AS INTEGER) AS dim, round(avg(x), 6) AS mean_x
FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings)
GROUP BY label, dim
"""


def cogroup_pandas_asof(spark, sf_dir):
    """COGROUPED-map UDF surface (``groupBy().cogroup().applyInPandas``):
    per-user pandas ``merge_asof`` of purchases against clicks — the
    canonical cogroup use-case (a per-key algorithm over TWO frames that
    pandas already implements). Must reproduce the Column-algebra as-of
    join exactly, so it shares ASOF_SQL as its oracle: same result from
    the declarative one-shuffle plan and the cogrouped Arrow path.

    Scale: both sides shuffle once on user_id (co-partitioned cogroup);
    each Python call sees only one user's rows. Completes the Python API
    matrix: scalar/grouped-agg pandas UDF, grouped map, map, cogrouped
    map, mapInArrow, UDTF.

    Measured caveat (why the declarative as-of is the hot path): one
    Python round-trip PER GROUP means ~9k tiny groups cost 12.4s at
    sf0.1 vs 0.6s for the union+window asof_join on the same data — the
    cogroup API pays off only when per-group work amortizes the call.
    The gate entry bounds the group count accordingly."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("last_click_id"),
        F.col("value").alias("last_click_value"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(
                columns=[
                    "event_id", "user_id", "ts",
                    "last_click_id", "last_click_value",
                ]
            )
        left = left.sort_values(["ts", "event_id"])
        right = right.sort_values(["click_ts", "last_click_id"])
        out = pd.merge_asof(
            left, right.drop(columns=["user_id"]),
            left_on="ts", right_on="click_ts", direction="backward",
        )
        out["last_click_id"] = out["last_click_id"].astype("Int64")
        return out[
            ["event_id", "user_id", "ts", "last_click_id", "last_click_value"]
        ]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="event_id long, user_id long, ts timestamp, "
            "last_click_id long, last_click_value double",
        )
    )


COGROUP_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS last_click_id, c.value AS last_click_value
FROM (SELECT * FROM events
      WHERE event_type = 'purchase' AND user_id < 200) p
ASOF LEFT JOIN (SELECT * FROM events
                WHERE event_type = 'click' AND user_id < 200) c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


REGISTRY_FUNCS = {
    "cogroup_pandas_asof": QuerySpec(cogroup_pandas_asof, COGROUP_ASOF_SQL),
    "pivot_monthly_event_counts": QuerySpec(pivot_monthly_event_counts, PIVOT_SQL),
    "unpivot_customer_metrics": QuerySpec(unpivot_customer_metrics, UNPIVOT_SQL),
    "stats_aggregates": QuerySpec(stats_aggregates, STATS_SQL),
    "percentile_aggregates": QuerySpec(percentile_aggregates, PERCENTILE_SQL),
    "minmax_by_aggregates": QuerySpec(minmax_by_aggregates, MINMAX_BY_SQL),
    "array_functions_battery": QuerySpec(array_functions_battery, ARRAY_SQL),
    "map_entries_from_json": QuerySpec(map_entries_from_json, MAP_ENTRIES_SQL),
    "explode_wordcount": QuerySpec(explode_wordcount, WORDCOUNT_SQL),
    "posexplode_tokens": QuerySpec(posexplode_tokens, POSEXPLODE_SQL),
    "string_functions_battery": QuerySpec(string_functions_battery, STRING_SQL),
    "date_functions_battery": QuerySpec(date_functions_battery, DATE_SQL),
    "window_range_frame": QuerySpec(window_range_frame, WINDOW_RANGE_SQL),
    "window_rank_family": QuerySpec(window_rank_family, WINDOW_RANK_SQL),
    "cross_join_region_nation": QuerySpec(cross_join_region_nation, CROSS_SQL),
    "sql_scalar_subquery": QuerySpec(sql_scalar_subquery, SQL_SCALAR_SQL),
    "pandas_zscore_per_type": QuerySpec(pandas_zscore_per_type, PANDAS_ZSCORE_SQL),
    "pandas_sigmoid_scores": QuerySpec(pandas_sigmoid_scores, PANDAS_SIGMOID_SQL),
    "udtf_sentence_split": QuerySpec(udtf_sentence_split, UDTF_SQL),
    "text_winnow_fingerprints": QuerySpec(text_winnow_fingerprints, WINNOW_SQL),
    "pandas_grouped_agg_geomean": QuerySpec(
        pandas_grouped_agg_geomean, PANDAS_GEOMEAN_SQL
    ),
    "outer_join_battery": QuerySpec(outer_join_battery, OUTER_JOIN_SQL),
    "setop_intersect_all": QuerySpec(setop_intersect_all, SETOP_INTERSECT_ALL_SQL),
    "setop_except_all": QuerySpec(setop_except_all, SETOP_EXCEPT_ALL_SQL),
    "null_handling_battery": QuerySpec(null_handling_battery, NULL_HANDLING_SQL),
    "collect_set_sorted": QuerySpec(collect_set_sorted, COLLECT_SET_SQL),
    "timeseries_resample_daily": QuerySpec(timeseries_resample_daily, RESAMPLE_SQL),
    "vector_mean_per_label": QuerySpec(vector_mean_per_label, VECTOR_MEAN_SQL),
    "bitwise_aggregates": QuerySpec(bitwise_aggregates, BITWISE_SQL),
}
