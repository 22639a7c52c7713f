"""Registry: Spark 4.0 DataFrame-API surfaces a migrating user reaches
for next — relational transpose, the correlated lateralJoin API, the
try_* error-safe arithmetic family, and the map higher-order functions.

Scale notes: transpose is driver-safe only on ALREADY-AGGREGATED tiny
frames (it pivots column names from data — the input here is 5 rows);
lateralJoin plans a correlated subquery per outer row, kept to a
dimension-sized outer side; try_* and map_* are pure codegen expressions
with zero extra shuffles over their non-try siblings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t


# =====================================================================
# DataFrame.transpose over an aggregated region scorecard
# =====================================================================

def transpose_region_metrics(spark, sf_dir):
    """Region scorecard flipped metrics-as-rows with Spark 4's native
    ``DataFrame.transpose``: aggregate customers per region (5 rows),
    then transpose so each metric becomes a row and each region a
    column — the layout a reporting surface wants.  Sums accumulate in
    DECIMAL before the final double cast so the values are
    reassociation-proof; transpose itself runs AFTER aggregation, so the
    pivoted frame is dimension-sized (transposing pivots data into
    column names — only ever sane on a tiny aggregated input, which is
    exactly how it is used here)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    per_region = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(30,8)")), 2
            ).cast("double").alias("balance_sum"),
            F.countDistinct("n_name").cast("double").alias("n_nations"),
        )
    )
    return per_region.transpose(F.col("r_name")).orderBy("key")


TRANSPOSE_SQL = """
WITH per AS (
  SELECT r_name,
         CAST(count(*) AS DOUBLE) AS n_customers,
         CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,8))), 2) AS DOUBLE)
           AS balance_sum,
         CAST(count(DISTINCT n_name) AS DOUBLE) AS n_nations
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
), metrics(key, ord) AS (
  VALUES ('balance_sum', 1), ('n_customers', 2), ('n_nations', 3)
)
SELECT m.key,
       max(CASE WHEN r_name = 'AFRICA' THEN
         CASE m.key WHEN 'n_customers' THEN n_customers
                    WHEN 'balance_sum' THEN balance_sum
                    ELSE n_nations END END) AS "AFRICA",
       max(CASE WHEN r_name = 'AMERICA' THEN
         CASE m.key WHEN 'n_customers' THEN n_customers
                    WHEN 'balance_sum' THEN balance_sum
                    ELSE n_nations END END) AS "AMERICA",
       max(CASE WHEN r_name = 'ASIA' THEN
         CASE m.key WHEN 'n_customers' THEN n_customers
                    WHEN 'balance_sum' THEN balance_sum
                    ELSE n_nations END END) AS "ASIA",
       max(CASE WHEN r_name = 'EUROPE' THEN
         CASE m.key WHEN 'n_customers' THEN n_customers
                    WHEN 'balance_sum' THEN balance_sum
                    ELSE n_nations END END) AS "EUROPE",
       max(CASE WHEN r_name = 'MIDDLE EAST' THEN
         CASE m.key WHEN 'n_customers' THEN n_customers
                    WHEN 'balance_sum' THEN balance_sum
                    ELSE n_nations END END) AS "MIDDLE EAST"
FROM per, metrics m
GROUP BY m.key, m.ord
ORDER BY m.key
"""


# =====================================================================
# DataFrame.lateralJoin: top-2 customers per nation (correlated limit)
# =====================================================================

def lateral_join_api_topk(spark, sf_dir):
    """Per-nation top-2 customers by balance through the Spark 4
    ``DataFrame.lateralJoin`` API: the right side is a correlated
    subquery (filter on ``.outer()`` reference + sort + LIMIT 2) that
    re-executes per outer row — the DataFrame twin of SQL LATERAL
    (already covered by sql_lateral_topk).  The outer side is the
    25-row nation dimension, which is the only shape a per-row
    correlated limit is sane for; the grouped-window rewrite (see
    topk_parts_per_brand) remains the path when the outer side is a
    fact table."""
    n = _t(spark, sf_dir, "nation").alias("n")
    c = _t(spark, sf_dir, "customer").alias("c")
    top2 = (
        c.where(F.col("c.c_nationkey") == F.col("n.n_nationkey").outer())
        .orderBy(F.desc("c.c_acctbal"), F.asc("c.c_custkey"))
        .limit(2)
    )
    return (
        n.lateralJoin(top2)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy("n_name", F.desc("acctbal"), "c_custkey")
    )


LATERAL_API_SQL = """
WITH ranked AS (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, c_custkey, c_name,
       CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
FROM ranked WHERE rk <= 2
ORDER BY n_name, acctbal DESC, c_custkey
"""


# =====================================================================
# try_* error-safe arithmetic family
# =====================================================================

_LMAX = 9223372036854775807


def try_arithmetic_battery(spark, sf_dir):
    """The try_* family end-to-end: engineered rows push bigint add /
    subtract / multiply into overflow and division by zero, and the
    try_ variants yield NULL instead of failing the 1000-task stage —
    the semantics a 100 TB job needs when one poisoned row must not
    kill the run.  Aggregated per order-status: null counts per
    operator plus try_sum/try_avg over the safe quotient.  All pure
    codegen expressions; same plan shape as the unsafe siblings."""
    o = _t(spark, sf_dir, "orders")
    big = F.when(F.col("o_orderkey") % 7 == 0, F.lit(_LMAX)).otherwise(
        F.col("o_orderkey").cast("long")
    )
    neg = F.when(F.col("o_orderkey") % 11 == 0, F.lit(-_LMAX - 1)).otherwise(
        F.col("o_orderkey").cast("long")
    )
    probed = o.select(
        "o_orderstatus",
        F.try_add(big, F.lit(1)).alias("t_add"),
        F.try_subtract(neg, F.lit(1)).alias("t_sub"),
        F.try_multiply(big, F.lit(2)).alias("t_mul"),
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 5).cast("double")
        ).alias("t_div"),
    )
    return (
        probed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("t_add").isNull(), 1).otherwise(0)).alias(
                "add_overflows"
            ),
            F.sum(F.when(F.col("t_sub").isNull(), 1).otherwise(0)).alias(
                "sub_overflows"
            ),
            F.sum(F.when(F.col("t_mul").isNull(), 1).otherwise(0)).alias(
                "mul_overflows"
            ),
            F.sum(F.when(F.col("t_div").isNull(), 1).otherwise(0)).alias(
                "div_by_zero"
            ),
            F.round(
                F.try_sum(F.col("t_div").cast("decimal(30,8)")), 2
            ).cast("double").alias("safe_div_sum"),
        )
        .orderBy("o_orderstatus")
    )


TRY_ARITH_SQL = f"""
WITH probed AS (
  SELECT o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE CAST(o_orderkey AS BIGINT) + 1 END AS t_add,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE CAST(o_orderkey AS BIGINT) - 1 END AS t_sub,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE CAST(o_orderkey AS BIGINT) * 2 END AS t_mul,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE o_totalprice / CAST(o_orderkey % 5 AS DOUBLE) END AS t_div
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n_rows,
       sum(CASE WHEN t_add IS NULL THEN 1 ELSE 0 END) AS add_overflows,
       sum(CASE WHEN t_sub IS NULL THEN 1 ELSE 0 END) AS sub_overflows,
       sum(CASE WHEN t_mul IS NULL THEN 1 ELSE 0 END) AS mul_overflows,
       sum(CASE WHEN t_div IS NULL THEN 1 ELSE 0 END) AS div_by_zero,
       CAST(round(sum(CAST(t_div AS DECIMAL(30,8))), 2) AS DOUBLE)
         AS safe_div_sum
FROM probed
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# =====================================================================
# map higher-order functions battery
# =====================================================================

def map_functions_battery(spark, sf_dir):
    """Map higher-order functions over a per-status month→count map:
    map_from_entries builds it, transform_values rescales counts to
    shares, map_filter keeps busy months, map_zip_with joins the count
    map with a revenue map — then one explode back to rows so the gate
    can value-check the pipeline.  Everything is codegen expressions on
    grouped data; the maps never exceed 12 keys by construction."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.month("o_orderdate").alias("m"),
        F.col("o_totalprice").cast("decimal(30,8)").alias("price"),
    )
    per_month = o.groupBy("o_orderstatus", "m").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price").alias("rev"),
    )
    mapped = per_month.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("m", "n")))
        ).alias("counts"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("m", "rev")))
        ).alias("revs"),
        F.sum("n").alias("total"),
    )
    zipped = mapped.select(
        "o_orderstatus",
        F.map_zip_with(
            F.map_filter("counts", lambda _, v: v >= 5),
            F.transform_values(
                "revs", lambda _, v: F.round(v, 2).cast("double")
            ),
            lambda _, n, rev: F.struct(
                n.alias("n"),
                rev.alias("rev"),
            ),
        ).alias("joined"),
        "total",
    )
    return (
        zipped.select(
            "o_orderstatus",
            "total",
            F.explode("joined").alias("month", "v"),
        )
        .filter(F.col("v.n").isNotNull())
        .select(
            "o_orderstatus",
            "month",
            F.col("v.n").alias("n_orders"),
            F.round(F.col("v.n") / F.col("total"), 4).alias("share"),
            F.col("v.rev").alias("revenue"),
        )
        .orderBy("o_orderstatus", "month")
    )


MAP_BATTERY_SQL = """
WITH per AS (
  SELECT o_orderstatus, month(o_orderdate) AS month,
         count(*) AS n_orders,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1, 2
), tot AS (
  SELECT o_orderstatus, sum(n_orders) AS total FROM per GROUP BY 1
)
SELECT p.o_orderstatus, p.month, p.n_orders,
       CAST(round(p.n_orders * 1.0 / t.total, 4) AS DOUBLE) AS share,
       p.revenue
FROM per p JOIN tot t USING (o_orderstatus)
WHERE p.n_orders >= 5
ORDER BY p.o_orderstatus, p.month
"""


# =====================================================================
# polymorphic Python UDTF: output schema computed by analyze()
# =====================================================================

_WIN = 3  # token-window width baked into the SQL below


def udtf_polymorphic_token_windows(spark, sf_dir):
    """POLYMORPHIC Python UDTF: ``analyze()`` computes the output schema
    from the literal window-width argument at plan time — tok1..tokN
    become real typed columns, not an array — so the same table function
    serves any N without code changes (the Spark 4 UDTF surface beyond
    the static-schema udtf_sentence_split).  Emits each document's
    sliding 3-token windows as columns plus the window position.

    Scale: Python UDTFs are row-at-a-time — the registry keeps this on a
    bounded cohort (doc_id < 50, same as the static UDTF entry) and the
    docstring points bulk n-gram work at the codegen shingle operators
    (functions/text.py); this entry exists to pin the API surface."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class TokenWindows:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument):
            width = n.value  # literal at plan time
            return AnalyzeResult(
                StructType(
                    [StructField("pos", IntegerType())]
                    + [
                        StructField(f"tok{i + 1}", StringType())
                        for i in range(width)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield (i, *toks[i : i + n])

    spark.udtf.register("udtf_token_windows", udtf(TokenWindows))
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_win_docs")
    return spark.sql(
        f"""
        SELECT doc_id, w.pos, w.tok1, w.tok2, w.tok3
        FROM udtf_win_docs, LATERAL udtf_token_windows(text, {_WIN}) w
        """
    )


UDTF_POLY_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 50)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       toks[i] AS tok1, toks[i + 1] AS tok2, toks[i + 2] AS tok3
FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
"""


# =====================================================================
# UDTF with TABLE argument + PARTITION BY: per-partition lifecycle
# =====================================================================

def udtf_table_arg_per_source(spark, sf_dir):
    """UDTF consuming a TABLE argument with PARTITION BY — the closest
    Spark surface to the reference's per-shard Processor lifecycle
    (Processor callback per shard, src/Kinesis/Coordination.hs:51-53):
    ``__init__`` is the processor opening a shard, ``eval`` sees every
    record of that partition, ``terminate`` emits the shard summary when
    the partition is exhausted.  Here each source partition folds doc
    count, total chars, and the distinct-language count into one
    summary row.

    Scale: Spark shuffles on the PARTITION BY key and feeds each
    partition's rows to one UDTF instance — the same keyed-shuffle cost
    as a groupBy, with arbitrary imperative per-partition state; use it
    when the per-partition fold genuinely can't be expressed as
    aggregates (this one could — the entry pins the lifecycle surface)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="source string, n_docs int, total_chars bigint, "
        "n_langs int"
    )
    class PerSourceStats:
        def __init__(self):
            self.src = None
            self.n = 0
            self.chars = 0
            self.langs = set()

        def eval(self, row):
            self.src = row["source"]
            self.n += 1
            self.chars += len(row["text"])
            self.langs.add(row["lang"])

        def terminate(self):
            if self.src is not None:
                yield self.src, self.n, self.chars, len(self.langs)

    spark.udtf.register("udtf_per_source_stats", PerSourceStats)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_src_docs")
    return spark.sql(
        """
        SELECT * FROM udtf_per_source_stats(
          TABLE(udtf_src_docs) PARTITION BY source
        )
        ORDER BY source
        """
    )


UDTF_TABLE_ARG_SQL = """
SELECT source, CAST(count(*) AS INTEGER) AS n_docs,
       sum(length(text)) AS total_chars,
       CAST(count(DISTINCT lang) AS INTEGER) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


# =====================================================================
# Observation API: in-flight data-quality metrics during an ETL pass
# =====================================================================

def observed_ingest_metrics(spark, sf_dir):
    """Data-quality counters observed DURING a real ETL pass with the
    Observation API: the shipped-lineitem cohort streams to a noop sink
    (the stand-in for a production write) while ``df.observe`` computes
    row count, decimal-exact quantity/price sums, and the date range on
    the SAME pass — no second scan of the table to get the audit
    numbers.  The observed metrics are returned as the 1-row result.

    Scale: at 100 TB the difference between observe-on-the-write and a
    separate audit query is a full extra table scan; Observation rides
    the task-completion path (an AccumulatorV2 under the hood), adding
    zero shuffles."""
    from pyspark.sql import Observation

    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    obs = Observation("ingest_dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(30,8)")), 2)
        .cast("double")
        .alias("qty_sum"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,8)")), 2)
        .cast("double")
        .alias("price_sum"),
        F.min(F.col("l_shipdate").cast("string")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("string")).alias("last_ship"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["qty_sum"],
                m["price_sum"],
                m["first_ship"],
                m["last_ship"],
            )
        ],
        "n_rows long, qty_sum double, price_sum double, "
        "first_ship string, last_ship string",
    )


OBSERVED_SQL = """
SELECT count(*) AS n_rows,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(30,8))), 2) AS DOUBLE)
         AS qty_sum,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2) AS DOUBLE)
         AS price_sum,
       CAST(min(l_shipdate) AS VARCHAR) AS first_ship,
       CAST(max(l_shipdate) AS VARCHAR) AS last_ship
FROM lineitem
WHERE l_shipdate IS NOT NULL
"""


# =====================================================================
# parameterized SQL: named args + IDENTIFIER() + GROUP BY/ORDER BY ALL
# =====================================================================

def sql_parameterized_identifier(spark, sf_dir):
    """Parameterized SQL end-to-end: the table reference binds through
    ``IDENTIFIER(:tbl)`` and the threshold through a typed named
    parameter — no string interpolation anywhere, so dynamic table
    routing carries zero injection surface — and the aggregation uses
    the migration-friendly ``GROUP BY ALL`` / ``ORDER BY ALL`` shorthand
    (table stakes for a DuckDB-origin user).  Same plan as the
    hand-written form; purely a binding-layer surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("param_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :floor
        GROUP BY ALL
        ORDER BY ALL
        """,
        args={"tbl": "param_orders", "floor": 50000.0},
    )


SQL_PARAM_IDENT_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_totalprice > 50000.0
GROUP BY ALL
ORDER BY ALL
"""


# =====================================================================
# Arrow-optimized scalar Python UDF
# =====================================================================

def arrow_scalar_udf_scores(spark, sf_dir):
    """The Arrow-optimized scalar Python UDF (``udf(useArrow=True)``):
    row-level Python semantics with Arrow-batched transfer — the middle
    tier between the legacy pickled UDF (never used in this repo) and a
    vectorized pandas_udf.  The kernel is a per-row order-risk score
    with Python control flow; the gate reproduces it as a SQL CASE.

    Scale: useArrow removes the per-row (de)serialization tax but the
    Python loop remains — pandas_udf stays the hot-path answer; this
    entry pins the API tier and its exact semantics."""
    from pyspark.sql.functions import udf

    @udf("double", useArrow=True)
    def risk(price: float, priority: str) -> float:
        # rounding happens OUTSIDE in F.round: Python round() is
        # half-even over the binary float and disagrees with SQL round
        # on .xxxx5 boundaries — a real cross-engine lesson
        base = 1.0 if priority.startswith("1") else 0.5
        if price is None or price <= 0:
            return 0.0
        return base * min(price, 100000.0) / 1000.0

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return (
        o.select(
            "o_orderkey",
            F.round(
                risk("o_totalprice", "o_orderpriority"), 4
            ).alias("risk_score"),
        )
        .orderBy("o_orderkey")
    )


ARROW_UDF_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 0.0
            ELSE round((CASE WHEN o_orderpriority LIKE '1%' THEN 1.0
                             ELSE 0.5 END)
                       * least(o_totalprice, 100000.0) / 1000.0, 4)
       END AS risk_score
FROM orders
WHERE o_orderkey % 20 = 0
ORDER BY o_orderkey
"""


# =====================================================================
# FILTER (WHERE ...) aggregate clause
# =====================================================================

def filter_clause_aggregates(spark, sf_dir):
    """The SQL-standard ``agg(...) FILTER (WHERE ...)`` clause — the
    declarative form of conditional aggregation (the CASE-WHEN
    equivalents live in conditional_aggregates): per order status, count
    and decimal-sum restricted to three independent predicates in ONE
    aggregate pass.  Catalyst plans the same single hash aggregate as
    the CASE form — the clause is ergonomics, not a new plan.

    DuckDB supports the identical syntax, so the oracle is literally the
    same query text shape."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("filter_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_totalprice > 100000)
                 AS n_big,
               count(*) FILTER (WHERE o_orderpriority LIKE '1%')
                 AS n_urgent,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                          FILTER (WHERE o_orderdate >=
                                  TIMESTAMP '1997-01-01 00:00:00'), 2)
                    AS DOUBLE) AS recent_revenue
        FROM filter_orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


FILTER_CLAUSE_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       count(*) FILTER (WHERE o_orderpriority LIKE '1%') AS n_urgent,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                  FILTER (WHERE o_orderdate >=
                          TIMESTAMP '1997-01-01 00:00:00'), 2)
            AS DOUBLE) AS recent_revenue
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# =====================================================================
# keyset pagination (the scale-correct pagination pattern)
# =====================================================================

_PAGE = 50


def pagination_keyset_orders(spark, sf_dir):
    """Page 3 of the order book by KEYSET, not OFFSET: the cursor is the
    last (o_orderdate, o_orderkey) of page 2, and page 3 is a pushed-down
    range predicate + top-k — cost stays O(page) forever.  OFFSET-based
    pagination re-scans and re-sorts everything before the offset (page
    10⁶ of a 100 TB table reads the whole table); the keyset predicate
    reaches the parquet scan as a filter instead.  The cursor itself is
    computed with a deterministic 2-page top-k (same ordering) so the
    whole entry is self-contained and oracle-checkable.

    Scale: both steps plan TakeOrderedAndProject (partial per-partition
    top-k, driver merge) with PushedFilters on the keyset predicate."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    first_two = (
        o.orderBy("o_orderdate", "o_orderkey").limit(2 * _PAGE).collect()
    )
    if not first_two:
        # empty table: page 3 is empty; no cursor to anchor on
        return spark.createDataFrame(
            [], "o_orderkey long, o_orderdate string, o_totalprice double"
        )
    cur_date, cur_key = (
        first_two[-1]["o_orderdate"],
        first_two[-1]["o_orderkey"],
    )
    page3 = (
        o.filter(
            (F.col("o_orderdate") > F.lit(cur_date))
            | (
                (F.col("o_orderdate") == F.lit(cur_date))
                & (F.col("o_orderkey") > F.lit(cur_key))
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_PAGE)
    )
    return page3.select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


PAGINATION_SQL = f"""
WITH page AS (
  SELECT o_orderkey, o_orderdate, o_totalprice
  FROM orders
  ORDER BY o_orderdate, o_orderkey
  LIMIT {_PAGE} OFFSET {2 * _PAGE}
)
SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice
FROM page
"""


# =====================================================================
# DataFrame.groupingSets API (4.0)
# =====================================================================

def groupingsets_api_orders(spark, sf_dir):
    """The Spark 4 ``DataFrame.groupingSets`` API — the programmatic
    twin of GROUP BY GROUPING SETS (already covered in SQL form by
    groupingsets_customer_segments): per-(status, priority) totals, per-
    status subtotals, and the grand total in ONE Expand-based aggregate
    pass, built without SQL strings.  NULL grouping keys are labeled via
    ``grouping()`` so subtotal rows are unambiguous.

    Scale: grouping sets = one Expand (xN sets) + one hash aggregate —
    the same plan the SQL form gets; never N separate scans unioned."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,8)")), 2
            ).cast("double").alias("price_sum"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


GROUPINGSETS_API_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
         AS price_sum,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


# =====================================================================
# mode / median battery (deterministic tie-breaking)
# =====================================================================

def mode_median_battery(spark, sf_dir):
    """``mode(deterministic=True)`` and exact ``median`` per order
    status: deterministic mode returns the LOWEST value among
    equally-frequent candidates (Spark 4 semantics), which the oracle
    reproduces with a count-desc/value-asc row_number — the only way a
    statistical mode can sit under a cross-engine value gate.  Median is
    the exact interpolated percentile in both engines.

    Scale: both are single hash-aggregate statistics; mode's state is
    bounded by per-group cardinality (here: 5 priorities x 12 months),
    not row count."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.mode("o_orderpriority", True).alias("mode_priority"),
            F.mode(F.month("o_orderdate"), True).alias("mode_month"),
            F.round(F.median("o_totalprice"), 2).alias("median_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


MODE_MEDIAN_SQL = """
WITH pr AS (
  SELECT o_orderstatus, o_orderpriority AS v, count(*) AS n
  FROM orders GROUP BY 1, 2
  QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                             ORDER BY n DESC, v ASC) = 1
), mo AS (
  SELECT o_orderstatus, month(o_orderdate) AS v, count(*) AS n
  FROM orders GROUP BY 1, 2
  QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                             ORDER BY n DESC, v ASC) = 1
), md AS (
  SELECT o_orderstatus,
         CAST(round(median(o_totalprice), 2) AS DOUBLE) AS median_price,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT md.o_orderstatus, pr.v AS mode_priority,
       CAST(mo.v AS INTEGER) AS mode_month,
       md.median_price, md.n_orders
FROM md JOIN pr USING (o_orderstatus) JOIN mo USING (o_orderstatus)
ORDER BY md.o_orderstatus
"""


REGISTRY_MODERN3 = {
    "udtf_polymorphic_token_windows": QuerySpec(
        udtf_polymorphic_token_windows, UDTF_POLY_SQL
    ),
    "udtf_table_arg_per_source": QuerySpec(
        udtf_table_arg_per_source, UDTF_TABLE_ARG_SQL
    ),
    "observed_ingest_metrics": QuerySpec(observed_ingest_metrics, OBSERVED_SQL),
    "transpose_region_metrics": QuerySpec(
        transpose_region_metrics, TRANSPOSE_SQL
    ),
    "lateral_join_api_topk": QuerySpec(lateral_join_api_topk, LATERAL_API_SQL),
    "try_arithmetic_battery": QuerySpec(
        try_arithmetic_battery, TRY_ARITH_SQL
    ),
    "map_functions_battery": QuerySpec(map_functions_battery, MAP_BATTERY_SQL),
    "mode_median_battery": QuerySpec(mode_median_battery, MODE_MEDIAN_SQL),
    "filter_clause_aggregates": QuerySpec(
        filter_clause_aggregates, FILTER_CLAUSE_SQL
    ),
    "pagination_keyset_orders": QuerySpec(
        pagination_keyset_orders, PAGINATION_SQL
    ),
    "groupingsets_api_orders": QuerySpec(
        groupingsets_api_orders, GROUPINGSETS_API_SQL
    ),
    "sql_parameterized_identifier": QuerySpec(
        sql_parameterized_identifier, SQL_PARAM_IDENT_SQL
    ),
    "arrow_scalar_udf_scores": QuerySpec(
        arrow_scalar_udf_scores, ARROW_UDF_SQL
    ),
}
