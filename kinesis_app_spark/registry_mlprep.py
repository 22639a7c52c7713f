"""ML feature/label preparation queries: per-user sequential features
and deterministic negative sampling.

Both are pure window/hash arithmetic — no RNG, no Python — so the DuckDB
oracle reproduces every value exactly, and both scale as single-key
shuffles (user_id / (custkey, partkey)).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t


# =====================================================================
# per-user sequential features
# =====================================================================

def user_event_features(spark, sf_dir):
    """The classic sequence-model feature set per event: ordinal index,
    exact micros since the previous event, purchases to date, and the
    rolling 10-event value sum. All four ride ONE shuffle on user_id —
    three frame specs over the same partition+order chain without
    re-sorting. Outputs stay integer/2-decimal-exact (micros as bigint,
    sums of 2-decimal values) so no cross-engine float surface; the
    rolling AVG a model wants is value_sum_10 / least(event_idx, 10),
    derived after load rather than emitted as a rounded ratio."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wroll = w.rowsBetween(-9, Window.currentRow)
    return (
        e.select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("event_idx"),
            (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("micros_since_prev"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .over(wcum)
            .cast("long")
            .alias("purchases_to_date"),
            F.round(F.sum("value").over(wroll), 2).alias("value_sum_10"),
        )
        .orderBy("event_id")
    )


USER_FEATURES_SQL = """
SELECT event_id, user_id,
       row_number() OVER w AS event_idx,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS micros_since_prev,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            OVER wc AS BIGINT) AS purchases_to_date,
       round(sum(value) OVER wr, 2) AS value_sum_10
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wc AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING),
       wr AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# =====================================================================
# deterministic negative sampling
# =====================================================================

def negative_sample_parts(spark, sf_dir):
    """Recommendation-training negatives: for every customer, up to 8
    parts they never purchased, drawn by md5-hash arithmetic (candidate
    = md5(custkey, i) mod |parts| — part keys are contiguous 0..n-1, so
    the draw is uniform over the catalog). Candidates are generated
    linearly (customers x 8 explode — never a customers x parts cross),
    deduped, and anti-joined against the positive set on (custkey,
    partkey). 'Up to 8': hash collisions and accidental positives thin
    the draw, the standard and stated semantics. Deterministic, so the
    oracle computes the identical negative set."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    pos = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    n_parts = p.agg(F.count(F.lit(1)).alias("n_parts"))
    cand = (
        c.select(F.col("c_custkey").alias("custkey"))
        .crossJoin(F.broadcast(n_parts))
        .select(
            "custkey",
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("i"),
            "n_parts",
        )
        .select(
            "custkey",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("-", F.col("custkey"), F.col("i"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("partkey"),
        )
        .distinct()
    )
    return cand.join(pos, ["custkey", "partkey"], "left_anti").orderBy(
        "custkey", "partkey"
    )


NEGATIVE_SAMPLE_SQL = """
WITH pos AS (
  SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), np AS (
  SELECT count(*) AS n_parts FROM part
), cand AS (
  SELECT DISTINCT c_custkey AS custkey,
         CAST(concat('0x', substr(md5(c_custkey || '-' || i), 1, 8))
              AS BIGINT) % n_parts AS partkey
  FROM customer CROSS JOIN np, UNNEST(generate_series(1, 8)) AS g(i)
)
SELECT custkey, partkey
FROM cand
WHERE NOT EXISTS (
  SELECT 1 FROM pos WHERE pos.custkey = cand.custkey
                      AND pos.partkey = cand.partkey
)
ORDER BY custkey, partkey
"""


REGISTRY_MLPREP = {
    "user_event_features": QuerySpec(user_event_features, USER_FEATURES_SQL),
    "negative_sample_parts": QuerySpec(
        negative_sample_parts, NEGATIVE_SAMPLE_SQL
    ),
}
