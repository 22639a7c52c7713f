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


def temporal_join_user_value(spark, sf_dir):
    """Point-in-time (temporal) join: each click enriched with the SCD2
    purchase-version active at click time. The key identity: an SCD2
    point-in-time join IS a backward as-of join on valid_from within the
    key partition — the interval predicate (valid_from <= ts < valid_to)
    is implied because valid_to is exactly the next version's valid_from.
    So this reuses operators/asof.py's one-shuffle union+window plan: no
    range join, no theta join, no interval explode. The oracle is the
    explicit interval LEFT JOIN a warehouse would write."""
    from kinesis_app_spark.operators.asof import asof_join
    from kinesis_app_spark.operators.cdc import scd2_history

    e = _t(spark, sf_dir, "events")
    scoped = e.filter(F.col("user_id") < 200)
    purchases = scoped.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    hist = scd2_history(
        purchases, keys=["user_id"], ts_col="ts", order_cols=["event_id"]
    )
    dim = hist.select(
        "user_id",
        "valid_from",
        F.col("value").alias("ver_value"),
        F.col("event_id").alias("ver_event_id"),
    )
    clicks = scoped.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        clicks,
        dim,
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["ver_value", "ver_event_id"],
    )
    return joined.select(
        "user_id", "event_id", "ts", "ver_value", "ver_event_id"
    ).orderBy("event_id")


TEMPORAL_JOIN_SQL = """
WITH vers AS (
  SELECT user_id, value AS ver_value, event_id AS ver_event_id,
         ts AS valid_from, lead(ts) OVER w AS valid_to
  FROM events WHERE event_type = 'purchase' AND user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), clicks AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_type = 'click' AND user_id < 200
)
SELECT c.user_id, c.event_id, c.ts, v.ver_value, v.ver_event_id
FROM clicks c LEFT JOIN vers v
  ON c.user_id = v.user_id AND v.valid_from <= c.ts
     AND (v.valid_to IS NULL OR c.ts < v.valid_to)
ORDER BY c.event_id
"""


REGISTRY_CDC = {
    "cdc_merge_orders": QuerySpec(cdc_merge_orders, CDC_MERGE_SQL),
    "scd2_user_value_history": QuerySpec(scd2_user_value_history, SCD2_SQL),
    "temporal_join_user_value": QuerySpec(
        temporal_join_user_value, TEMPORAL_JOIN_SQL
    ),
}
