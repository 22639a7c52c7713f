"""Registry: CDC merge (MERGE INTO semantics as a DataFrame operator).

The change batch is synthesized deterministically from orders — updates
for keys % 7, deletes for % 13 (with a same-batch conflict on % 91 keys
that latest-wins compaction must resolve to the delete), inserts with
shifted keys for % 97 — and mirrored verbatim in the oracle SQL, so the
full merged snapshot is value-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.operators.cdc import apply_changes
from kinesis_app_spark.registry_util import QuerySpec, table as _t


def cdc_merge_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        "o_orderdate",
        F.lit("X-UPDATED").alias("o_orderpriority"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    deletes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
        F.lit("D").alias("op"), F.lit(2).alias("seq"),
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        "o_orderdate",
        F.lit("NEW").alias("o_orderpriority"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return apply_changes(o, changes, keys=["o_orderkey"], seq_col="seq")


CDC_MERGE_SQL = """
WITH changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 10.0 AS o_totalprice, o_orderdate,
         'X-UPDATED' AS o_orderpriority, 'U' AS op, 1 AS seq
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, 'D', 2
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', 1.0, o_orderdate, 'NEW', 'U', 1
  FROM orders WHERE o_orderkey % 97 = 0
), compacted AS (
  SELECT * FROM changes
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
                             ORDER BY seq DESC, op ASC) = 1
)
SELECT coalesce(s.o_orderkey, c.o_orderkey) AS o_orderkey,
       CASE WHEN c.op = 'U' THEN c.o_custkey ELSE s.o_custkey END AS o_custkey,
       CASE WHEN c.op = 'U' THEN c.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
       CASE WHEN c.op = 'U' THEN c.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
       CASE WHEN c.op = 'U' THEN c.o_orderdate ELSE s.o_orderdate END AS o_orderdate,
       CASE WHEN c.op = 'U' THEN c.o_orderpriority ELSE s.o_orderpriority END AS o_orderpriority
FROM orders s FULL JOIN compacted c ON s.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


def scd2_user_value_history(spark, sf_dir):
    """SCD2 validity intervals over each user's purchase events: every
    purchase opens a version closed by the user's next purchase (lead
    window, one shuffle, no self-join)."""
    from kinesis_app_spark.operators.cdc import scd2_history

    ev = (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") < 200))
        .select("user_id", "ts", "event_id", "value")
    )
    return scd2_history(ev, keys=["user_id"], ts_col="ts", order_cols=["event_id"])


SCD2_SQL = """
SELECT user_id, ts, event_id, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'purchase' AND user_id < 200
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


REGISTRY_CDC = {
    "cdc_merge_orders": QuerySpec(cdc_merge_orders, CDC_MERGE_SQL),
    "scd2_user_value_history": QuerySpec(scd2_user_value_history, SCD2_SQL),
}
