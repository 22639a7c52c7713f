"""Registry: modern Spark 4.x engine surfaces — recursive CTE, VariantType
JSON, native XML parsing, and the arrow-native map API.

These rows exist because a user migrating from any contemporary engine
(DuckDB, Trino, Snowflake) expects them as table stakes; each one is the
idiomatic Spark 4 construct, not an emulation:

- WITH RECURSIVE (SPARK-24497, 4.0): iterative hierarchy traversal inside
  ONE declarative query — Catalyst manages the loop, no driver-side
  iteration, no localCheckpoint discipline needed.
- VariantType (4.0): binary semi-structured JSON with typed path access —
  the scan parses ONCE into variant and every ``variant_get`` is a cheap
  typed probe, vs re-parsing the JSON string per extraction.
- from_xml (4.0): schema-on-read XML without an external package.
- mapInArrow: the zero-copy Arrow batch API — no pandas materialization
  at all, for kernels that are pure columnar arithmetic.

Scale notes per entry in the docstrings; every entry is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t


def sql_recursive_cte_chain(spark, sf_dir):
    """Hierarchy traversal with WITH RECURSIVE: customers form a synthetic
    tree (parent(c) = c/10, roots at c in 1..9) and the recursion labels
    every customer with its depth; the result aggregates per depth with
    exact decimal balance sums. The oracle is the SAME recursive SQL —
    DuckDB and Spark 4 both execute it natively.

    Scale: each recursion step is an equi-join of the frontier against the
    (pruned) customer scan — keyed shuffles, depth-bounded iteration; the
    frontier shrinks geometrically for a fan-out tree. This is the one
    loop shape Catalyst now owns end-to-end."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    # same text as the oracle, retargeted at the temp view (floor() keeps
    # the parent computation truncation-identical across engines — a bare
    # CAST(x/10 AS BIGINT) rounds in DuckDB but truncates in Spark)
    return spark.sql(RECURSIVE_CHAIN_SQL.replace("FROM customer", "FROM customer_v"))


RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE chain(c_custkey, depth, acctbal) AS (
  SELECT c_custkey, 1 AS depth, c_acctbal
  FROM customer WHERE c_custkey BETWEEN 1 AND 9
  UNION ALL
  SELECT c.c_custkey, p.depth + 1, c.c_acctbal
  FROM customer c JOIN chain p
    ON CAST(floor(c.c_custkey / 10) AS BIGINT) = p.c_custkey
  WHERE c.c_custkey > 9
)
SELECT depth,
       count(*) AS n_customers,
       min(c_custkey) AS min_key,
       max(c_custkey) AS max_key,
       CAST(round(sum(CAST(acctbal AS DECIMAL(30,8))), 2) AS DOUBLE) AS balance_sum
FROM chain
GROUP BY depth
ORDER BY depth
"""


def variant_json_events(spark, sf_dir):
    """Semi-structured access through VariantType: ``parse_json`` once in
    the scan projection, then typed ``variant_get`` probes — the Spark 4
    answer to JSON columns (binary variant encoding, no per-field string
    re-parse). Aggregates the extracted value per event_type.

    Scale: the variant parse happens in the same whole-stage-codegen pass
    as the filter and the aggregate's map side — one scan, one shuffle of
    (event_type, partials)."""
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count_if(F.col("k") % 2 == 0).alias("n_even"),
        )
        .orderBy("event_type")
    )


VARIANT_SQL = """
SELECT event_type,
       count(*) AS n_events,
       sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_sum,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
       count(*) FILTER (WHERE CAST(json_extract(props, '$.k') AS BIGINT) % 2 = 0)
         AS n_even
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def xml_ingest_orders(spark, sf_dir):
    """Native XML schema-on-read (Spark 4 ``from_xml``): order rows are
    serialized to XML documents (the shape a B2B feed would deliver),
    parsed back with an explicit schema, and aggregated from the PARSED
    struct only. The oracle computes the same aggregate straight from the
    source columns — asserting the serialize→parse roundtrip is lossless,
    which is exactly the property an XML ingest pipeline needs.

    Scale: serialization and parse are both per-row codegen projections —
    zero shuffle beyond the final aggregate."""
    o = _t(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<order><key>"),
        F.col("o_orderkey"),
        F.lit("</key><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><total>"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.lit("</total></order>"),
    )
    parsed = F.from_xml(xml, "key BIGINT, status STRING, total DECIMAL(18,2)")
    return (
        o.select(parsed.alias("p"))
        .groupBy(F.col("p.status").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("p.key").alias("key_sum"),
            F.round(F.sum(F.col("p.total").cast("decimal(30,8)")), 2)
            .cast("double")
            .alias("total_sum"),
        )
        .orderBy("status")
    )


XML_SQL = """
SELECT o_orderstatus AS status,
       count(*) AS n_orders,
       sum(o_orderkey) AS key_sum,
       CAST(round(sum(CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2)
                           AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_sum
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def arrow_vector_norms(spark, sf_dir):
    """Per-label vector-norm statistics via ``mapInArrow`` — the zero-copy
    batch API: the kernel receives pyarrow RecordBatches and computes each
    embedding's exact-integer squared L2 norm with numpy, with no pandas
    object materialization in between (for fixed-width columnar math this
    is the cheapest Python path Spark offers). The per-vector norms then
    aggregate per label JVM-side.

    Arithmetic is the repo's standard exact-integer discipline (1e-6
    scaling), so the DuckDB oracle matches bit-for-bit. Scale: one scan,
    Python does O(rows × d) multiplies per batch, the shuffle carries
    (label, partials) only."""
    import numpy as np
    import pyarrow as pa

    emb = _t(spark, sf_dir, "embeddings")
    scaled = emb.select(
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("long"),
        ).alias("v"),
    )

    def norms(batches):
        for batch in batches:
            labels = batch.column("label")
            vs = batch.column("v")
            if not len(vs):
                continue
            # zero-copy: one flatten over the list child + a reshape via
            # the (contiguous, uniform-width) offsets — no per-row scalars
            flat = np.asarray(vs.flatten(), dtype=np.int64)
            widths = np.diff(np.asarray(vs.offsets, dtype=np.int64))
            assert (widths == widths[0]).all(), "ragged embedding widths"
            x = flat.reshape(len(vs), int(widths[0]))
            sq = (x * x).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [labels, pa.array(sq, type=pa.int64())], ["label", "norm2"]
            )

    per_vec = scaled.mapInArrow(norms, schema="label int, norm2 long")
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.col("norm2").cast("decimal(38,0)"))
            .cast("long")
            .alias("norm2_sum"),
            F.min("norm2").alias("norm2_min"),
            F.max("norm2").alias("norm2_max"),
        )
        .orderBy("label")
    )


ARROW_NORMS_SQL = """
WITH per_vec AS (
  SELECT label,
         (SELECT sum(CAST(round(x::DOUBLE * 1e6) AS BIGINT)
                     * CAST(round(x::DOUBLE * 1e6) AS BIGINT))
          FROM unnest(embedding) AS t(x)) AS norm2
  FROM embeddings
)
SELECT label,
       count(*) AS n_vectors,
       CAST(sum(CAST(norm2 AS HUGEINT)) AS BIGINT) AS norm2_sum,
       min(norm2) AS norm2_min,
       max(norm2) AS norm2_max
FROM per_vec
GROUP BY label
ORDER BY label
"""


def sql_udf_net_revenue(spark, sf_dir):
    """SQL scalar UDF (CREATE FUNCTION … RETURN expr — Spark 4 SQL UDFs):
    the reusable business expression lives in the catalog, not copy-pasted
    into every query. The function body is pure arithmetic, so Catalyst
    INLINES it — zero call overhead, full codegen — which is the whole
    point vs a Python UDF. Cents-scaled exact-integer accumulation."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_rows,
               CAST(sum(CAST(CAST(round(net_price(l_extendedprice, l_discount)
                                        * 100) AS BIGINT) AS DECIMAL(38,0)))
                    AS BIGINT) AS net_centi_sum
        FROM lineitem_v
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


SQL_UDF_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CAST(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) AS HUGEINT)) AS BIGINT) AS net_centi_sum
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def sql_variables_param_query(spark, sf_dir):
    """Session variables (DECLARE/SET VARIABLE, Spark 4): the
    parameterized-report pattern — thresholds live in typed session state
    instead of string-interpolated SQL (no injection surface, one place
    to change). The oracle inlines the same constants."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE min_total DOUBLE DEFAULT 0.0"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE status_filter STRING DEFAULT 'F'")
    spark.sql("SET VARIABLE min_total = 150000.0")
    spark.sql("SET VARIABLE status_filter = 'O'")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)
                    AS DOUBLE) AS total
        FROM orders_v
        WHERE o_totalprice >= min_total AND o_orderstatus = status_filter
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


SQL_VARIABLES_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE AS total
FROM orders
WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def sql_scripting_two_step(spark, sf_dir):
    """SQL scripting (BEGIN…END compound statements, Spark 4): a
    procedural two-step — derive a data-dependent threshold into a
    variable (the p90 of order totals), then run the report filtered by
    it — without leaving SQL or round-tripping through the driver. The
    oracle expresses the same logic as a scalar subquery."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        BEGIN
          DECLARE p90 DOUBLE;
          SET p90 = (SELECT percentile(o_totalprice, 0.9) FROM orders_v);
          SELECT o_orderstatus,
                 count(*) AS n_top_decile,
                 CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)
                      AS DOUBLE) AS total
          FROM orders_v
          WHERE o_totalprice >= p90
          GROUP BY o_orderstatus
          ORDER BY o_orderstatus;
        END
        """
    )


SQL_SCRIPTING_SQL = """
SELECT o_orderstatus,
       count(*) AS n_top_decile,
       round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE AS total
FROM orders
WHERE o_totalprice >= (SELECT quantile_cont(o_totalprice, 0.9) FROM orders)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def sql_pipe_syntax_report(spark, sf_dir):
    """SQL pipe syntax (Spark 4.0 ``|>`` operators): the linear
    read-top-to-bottom form of a filter→aggregate→sort report — each
    stage's input is the previous stage's output, the way the optimizer
    already thinks. Same plan as the nested form; the oracle is the
    classic formulation."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pv")
    return spark.sql(
        """
        FROM lineitem_pv
        |> WHERE l_quantity >= 30
        |> AGGREGATE count(*) AS n_rows,
                     CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2)
                          AS DOUBLE) AS price_sum
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


SQL_PIPE_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2)::DOUBLE AS price_sum
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def collation_canonical_grouping(spark, sf_dir):
    """Collation-aware grouping (Spark 4.0 ``collate``): order priorities
    re-cased deterministically per row (upper/initcap/lower by orderkey
    mod 3 — a dirty-data twin) group back together under UTF8_LCASE
    WITHOUT a normalizing projection — the collation is metadata on the
    comparison, not a rewrite of the data. The emitted key is lowercased
    for cross-engine stability (the collated group's representative value
    is partition-order-dependent); the oracle groups by lower()."""
    o = _t(spark, sf_dir, "orders")
    mixed = (
        F.when(F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority"))
        .when(F.col("o_orderkey") % 3 == 1, F.initcap(F.lower("o_orderpriority")))
        .otherwise(F.lower("o_orderpriority"))
    )
    return (
        o.select(mixed.alias("pri_mixed"))
        .groupBy(F.expr("collate(pri_mixed, 'UTF8_LCASE')").alias("pri"))
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.lower(F.col("pri").cast("string")).alias("priority"),
            "n_orders",
        )
        .orderBy("priority")
    )


COLLATION_SQL = """
SELECT lower(CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                  WHEN o_orderkey % 3 = 1
                    THEN upper(substr(lower(o_orderpriority), 1, 1))
                         || substr(lower(o_orderpriority), 2)
                  ELSE lower(o_orderpriority) END) AS priority,
       count(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY priority
"""


REGISTRY_MODERN = {
    "sql_pipe_syntax_report": QuerySpec(sql_pipe_syntax_report, SQL_PIPE_SQL),
    "collation_canonical_grouping": QuerySpec(
        collation_canonical_grouping, COLLATION_SQL
    ),
    "sql_udf_net_revenue": QuerySpec(sql_udf_net_revenue, SQL_UDF_SQL),
    "sql_variables_param_query": QuerySpec(
        sql_variables_param_query, SQL_VARIABLES_SQL
    ),
    "sql_scripting_two_step": QuerySpec(
        sql_scripting_two_step, SQL_SCRIPTING_SQL
    ),
    "sql_recursive_cte_chain": QuerySpec(
        sql_recursive_cte_chain, RECURSIVE_CHAIN_SQL
    ),
    "variant_json_events": QuerySpec(variant_json_events, VARIANT_SQL),
    "xml_ingest_orders": QuerySpec(xml_ingest_orders, XML_SQL),
    "arrow_vector_norms": QuerySpec(arrow_vector_norms, ARROW_NORMS_SQL),
}
