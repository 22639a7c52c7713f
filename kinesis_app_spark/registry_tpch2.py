"""TPC-H battery, part 2: the remaining query *shapes* adapted to the
reduced synthetic schema (no partsupp, no commitdate/receiptdate/shipmode/
phone columns — see schemas.py).

What matters here is exercising the plan shapes the reference's users
would run through a SQL surface (SURVEY.md §2.2): correlated scalar
subqueries (decorrelated by Catalyst into joins against aggregates),
EXISTS / NOT EXISTS (left-semi / left-anti), HAVING over a scalar
subquery, market-share conditional aggregation, and multi-way
fact-to-fact joins. Each query keeps the original TPC-H number for the
shape it reproduces and documents the adaptation.

Scale notes: every query here shuffles only on join/group keys, keeps
dimension joins broadcastable (region/nation always; supplier at dim-like
cardinality), and expresses correlation declaratively so Catalyst
decorrelates instead of forcing a per-row subquery.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------
# q2 shape: correlated scalar subquery (max per correlated group)
# ---------------------------------------------------------------------

def q2_best_supplier_per_nation(spark, sf_dir):
    """Suppliers whose account balance is the maximum within their nation.

    Original q2 correlates on min(ps_supplycost) per part; without partsupp
    the same shape is max(s_acctbal) per nation. Spark plan: broadcast the
    per-nation aggregate (25 rows) back onto supplier — the decorrelated
    form; no per-row subquery execution.
    """
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    best = s.groupBy("s_nationkey").agg(F.max("s_acctbal").alias("max_bal"))
    return (
        s.join(F.broadcast(best), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


Q2_SQL = """
SELECT s_suppkey, s_name, n_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
"""


# ---------------------------------------------------------------------
# q4 shape: correlated EXISTS -> left-semi join
# ---------------------------------------------------------------------

def q4_order_priority(spark, sf_dir):
    """Order-priority counts for orders having at least one late-shipped
    line (l_shipdate > o_orderdate). Original q4's commit/receipt predicate
    adapted to shipdate-vs-orderdate; the EXISTS becomes a left-semi join
    with the correlated predicate in the join condition."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------
# q7 shape: two-nation volume shipping
# ---------------------------------------------------------------------

def q7_volume_shipping(spark, sf_dir):
    """Revenue flow between two specific nations by ship year. Same join
    graph as q7 (lineitem-orders-customer-supplier-nation x2) with the
    (supp, cust) nation-pair disjunction."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("supp_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cust_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------
# q8 shape: market share (conditional aggregation ratio)
# ---------------------------------------------------------------------

def q8_market_share(spark, sf_dir):
    """NATION_3's share of PROMO-part revenue by order year."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", _rev()).otherwise(0.0))
                / F.sum(_rev()),
                6,
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY o_year
"""


# ---------------------------------------------------------------------
# q9 shape: product profit by nation and year
# ---------------------------------------------------------------------

def q9_product_profit(spark, sf_dir):
    """Profit per supplier-nation per year; ps_supplycost replaced by a
    synthetic unit cost of 50% of p_retailprice.

    The profit sum is accumulated in DECIMAL: per-row double arithmetic is
    bit-identical across engines, and decimal summation is exact and
    order-independent, so the rounded cross-engine comparison can't flake
    on half-cent boundaries the way a reordered double sum can.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit = (_rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(30,8)"
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(l_extendedprice * (1 - l_discount)
                      - 0.5 * p_retailprice * l_quantity AS DECIMAL(30,8))), 2)::DOUBLE AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------
# q11 shape: HAVING over a scalar subquery of the same aggregate
# ---------------------------------------------------------------------

def q11_important_parts(spark, sf_dir):
    """Parts whose revenue within NATION_1-supplied lines exceeds 0.1% of
    that nation's total. The scalar subquery (grand total) is a 1-row
    aggregate cross-joined (auto-broadcast) onto the per-part aggregate.
    Sums accumulate in DECIMAL and the 0.1% cutoff compares as
    value*1000 > total — exact under any row order (a double sum here is
    order-dependent and can flip the rounding of a borderline part)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 1)
    base = l.join(s, l.l_suppkey == s.s_suppkey).select(
        "l_partkey", _rev().cast("decimal(30,8)").alias("val")
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("val").alias("value"))
    total = base.agg(F.sum("val").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select(
            "l_partkey", F.round("value", 2).cast("double").alias("value")
        )
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8)) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 1
), tot AS (
  SELECT sum(val) AS total FROM base
)
SELECT l_partkey, round(sum(val), 2)::DOUBLE AS value
FROM base, tot
GROUP BY l_partkey, total
HAVING sum(val) * 1000 > total
"""


# ---------------------------------------------------------------------
# q12 shape: two-bucket conditional counts
# ---------------------------------------------------------------------

def q12_late_shipment_priority(spark, sf_dir):
    """Per return flag: late-shipped lines (>90 days after order date)
    split into high-priority vs low-priority counts. Original q12's
    shipmode/receiptdate adapted to returnflag/shipdate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------
# q15 shape: aggregate, then filter to the aggregate's max (view + scalar
# subquery in the original)
# ---------------------------------------------------------------------

def q15_top_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------
# q16 shape: distinct-count with NOT IN exclusion
# ---------------------------------------------------------------------

def q16_part_supplier_counts(spark, sf_dir):
    """Distinct suppliers per (brand, type, size) bucket, excluding two
    brands and suppliers with negative balance (the original's complaint
    exclusion, adapted). partsupp replaced by lineitem as the part-supplier
    relation."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------
# q17 shape: correlated aggregate threshold (avg per part)
# ---------------------------------------------------------------------

def q17_small_quantity_revenue(spark, sf_dir):
    """Average yearly revenue from small-quantity orders of Brand#3 parts:
    lines with quantity below 20% of that part's average quantity. The
    correlated avg decorrelates into a per-part aggregate broadcast back
    onto the fact."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cutoff")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------------
# q20 shape: semi-join onto an aggregate-filtered key set
# ---------------------------------------------------------------------

def q20_high_volume_suppliers(spark, sf_dir):
    """Suppliers who shipped more than 300 units of SMALL-type parts in
    1996 (original q20's excess-stock predicate, with lineitem standing in
    for partsupp.availqty)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select(
        "p_partkey"
    )
    qualifying = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 300
)
"""


# ---------------------------------------------------------------------
# q21 shape: EXISTS + NOT EXISTS against the same fact
# ---------------------------------------------------------------------

def q21_sole_returned_supplier(spark, sf_dir):
    """Suppliers who were the *only* supplier with returned lines on a
    multi-supplier finished order: EXISTS (another supplier's line) AND
    NOT EXISTS (another supplier's returned line). Both correlations become
    semi/anti self-joins of lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sided = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        sided.join(s, sided.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
SELECT s_suppkey, s_name, count(*) AS numwait
FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND l1.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_suppkey, s_name
"""


# ---------------------------------------------------------------------
# q22 shape: scalar subquery threshold + anti join
# ---------------------------------------------------------------------

def q22_dormant_rich_customers(spark, sf_dir):
    """Per nation: customers with above-average positive balance and no
    urgent orders (original q22 with nationkey standing in for the phone
    country code; 'no orders at all' is empty in this data, so the anti
    join correlates on the urgent subset)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
"""


REGISTRY_TPCH2 = {
    "q2_best_supplier_per_nation": QuerySpec(q2_best_supplier_per_nation, Q2_SQL),
    "q4_order_priority": QuerySpec(q4_order_priority, Q4_SQL),
    "q7_volume_shipping": QuerySpec(q7_volume_shipping, Q7_SQL),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_SQL),
    "q11_important_parts": QuerySpec(q11_important_parts, Q11_SQL),
    "q12_late_shipment_priority": QuerySpec(q12_late_shipment_priority, Q12_SQL),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL),
    "q16_part_supplier_counts": QuerySpec(q16_part_supplier_counts, Q16_SQL),
    "q17_small_quantity_revenue": QuerySpec(q17_small_quantity_revenue, Q17_SQL),
    "q20_high_volume_suppliers": QuerySpec(q20_high_volume_suppliers, Q20_SQL),
    "q21_sole_returned_supplier": QuerySpec(q21_sole_returned_supplier, Q21_SQL),
    "q22_dormant_rich_customers": QuerySpec(q22_dormant_rich_customers, Q22_SQL),
}
