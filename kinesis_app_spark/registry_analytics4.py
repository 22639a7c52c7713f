"""Data-layout and sketch-driven analytics: Z-order clustering audit,
the portable-sketch suite (Misra-Gries exact heavy hitters, KMV
distinct / grouped / mergeable set operations, Count-Min point
frequencies), regex pattern matching over per-user event sequences, and
gaps-and-islands interval merging.

Every sketch here uses engine-portable arithmetic (MD5-60 via
conv/substr, Knuth multiplicative scrambles), so even the APPROXIMATE
estimates sit under the cross-engine value gate — see SCALE_DESIGN.md
"The portable-sketch suite".

Scale shapes:

- Z-order: the Morton interleave is pure codegen bit arithmetic (no
  shuffle at all to ASSIGN z-values); the audit aggregates per-bucket
  min/max spans — the same file-statistics a lakehouse table format
  (Delta/Iceberg OPTIMIZE ZORDER) would use for multi-dimensional data
  skipping. The "linear" comparison layout buckets by insertion order
  using ONE scalar broadcast (table max key), never a global sort.
- Heavy hitters: Misra-Gries runs per partition over Arrow batches with
  a fixed 200-counter summary, so the driver/shuffle only ever sees
  O(partitions x 200) candidate rows regardless of key cardinality; the
  exact recount is a broadcast semi-join + hash aggregate. Output is
  EXACT (the sketch only prunes), so it hash-matches a plain GROUP BY
  HAVING oracle.
- Pattern match: per-user sequences fold in one keyed shuffle (the same
  shape as sessionization); the regex runs once per user on a bounded
  string, inside codegen via regexp_count.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t


# =====================================================================
# Z-order (Morton) layout audit
# =====================================================================

_ZBITS = 10  # 10 bits per dimension -> 20-bit z-value
_ZBUCKETS = 256  # z >> 12 -> 256 buckets; linear layout uses 256 too
_KNUTH = 2654435761  # 2^32 / golden ratio: multiplicative key scramble


def _morton(x, y):
    """Interleave the low 10 bits of x (odd positions) and y (even):
    pure shift/and/or arithmetic, fully inside whole-stage codegen."""
    parts = []
    for i in range(_ZBITS):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda a, b: a + b, parts)


def zorder_layout_audit(spark, sf_dir):
    """Would Z-ordering lineitem by (l_partkey, l_suppkey) improve data
    skipping vs the natural insertion-order layout?  Assign every row a
    Morton z-value over 10-bit scrambles of (partkey, suppkey) — the
    multiplicative scramble models a high-cardinality dimension at any
    scale factor, and point lookups still prune because the scramble is
    deterministic — bucket the z-space into 256 files'-worth of ranges,
    and report the per-bucket
    min/max SPAN of each dimension — exactly the file statistics a
    reader would prune on.  The linear layout buckets rows by
    l_orderkey position (insertion order) for comparison; its spans
    cover nearly the whole key domain on both dims, while z-order
    buckets stay tight on both.

    Scale: z-value assignment is shuffle-free codegen arithmetic; each
    layout's audit is one hash aggregate on a 1-byte-ish bucket key; the
    linear layout's max-orderkey anchor is a 1-row scalar broadcast
    (allowlisted), never a global sort/ntile."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    # Knuth multiplicative scramble (2^32/phi) spreads each key over the
    # full 10-bit domain regardless of its native cardinality — pure
    # cross-engine bigint arithmetic, so the oracle reproduces it
    # bit-for-bit (no engine-specific hash function).
    x = (F.col("l_partkey").cast("long") * _KNUTH) % 1024
    y = (F.col("l_suppkey").cast("long") * _KNUTH) % 1024
    z = _morton(x, y)
    zb = li.select(
        F.shiftright(z, 12).alias("bucket"),
        x.alias("x"),
        y.alias("y"),
    )
    maxk = li.agg(F.max("l_orderkey").alias("maxk"))
    lin = li.crossJoin(F.broadcast(maxk)).select(
        (F.col("l_orderkey") * _ZBUCKETS / (F.col("maxk") + 1))
        .cast("long")
        .alias("bucket"),
        x.alias("x"),
        y.alias("y"),
    )

    def spans(df, layout):
        per_bucket = df.groupBy("bucket").agg(
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
        return per_bucket.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.avg("x_span"), 4).alias("avg_x_span"),
            F.round(F.avg("y_span"), 4).alias("avg_y_span"),
            F.max("x_span").alias("max_x_span"),
            F.max("y_span").alias("max_y_span"),
        )

    return spans(zb, "zorder").unionAll(spans(lin, "linear")).orderBy("layout")


def _morton_sql(x, y):
    parts = []
    for i in range(_ZBITS):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(parts)


ZORDER_SQL = f"""
WITH base AS (
  SELECT l_orderkey,
         (CAST(l_partkey AS BIGINT) * {_KNUTH}) % 1024 AS x,
         (CAST(l_suppkey AS BIGINT) * {_KNUTH}) % 1024 AS y
  FROM lineitem
), zb AS (
  SELECT ({_morton_sql('x', 'y')}) >> 12 AS bucket, x, y FROM base
), lin AS (
  SELECT CAST(floor(l_orderkey * {_ZBUCKETS}
                    / ((SELECT max(l_orderkey) FROM base) + 1))
              AS BIGINT) AS bucket, x, y
  FROM base
), zspans AS (
  SELECT bucket, max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
  FROM zb GROUP BY 1
), lspans AS (
  SELECT bucket, max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
  FROM lin GROUP BY 1
), both_layouts AS (
  SELECT 'zorder' AS layout, count(*) AS n_buckets,
         CAST(round(avg(x_span), 4) AS DOUBLE) AS avg_x_span,
         CAST(round(avg(y_span), 4) AS DOUBLE) AS avg_y_span,
         max(x_span) AS max_x_span, max(y_span) AS max_y_span
  FROM zspans
  UNION ALL
  SELECT 'linear', count(*),
         CAST(round(avg(x_span), 4) AS DOUBLE),
         CAST(round(avg(y_span), 4) AS DOUBLE),
         max(x_span), max(y_span)
  FROM lspans
)
SELECT * FROM both_layouts ORDER BY layout
"""


# =====================================================================
# exact heavy hitters via Misra-Gries pre-sketch
# =====================================================================

_MG_CAPACITY = 200  # guarantees recall for any item with share > 1/201
_HH_PERCENT = 1  # report tokens owning > 1% of the whole token stream


def _misra_gries_partition(batches):
    """Per-partition Misra-Gries summary over Arrow batches of document
    text: tokens stream through at most _MG_CAPACITY counters; any token
    with partition frequency > n_p/(capacity+1) is guaranteed a
    surviving counter (the classic decrement argument), so
    globally-frequent tokens always reach the recount phase.  Only the
    surviving KEYS are emitted — O(capacity) rows per partition, never
    the token stream itself."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for text in pdf["text"].astype(str):
            for tok in text.split(" "):
                if not tok:
                    continue
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < _MG_CAPACITY:
                    counters[tok] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
    if counters:
        yield pd.DataFrame({"token": list(counters.keys())})


def exact_token_recount(docs, candidates, percent):
    """Exact heavy-hitter recount over broadcast candidates: one
    column-pruned pass of ``docs`` (a (text) projection) counting only
    tokens in the sorted candidate array (array_contains prunes BEFORE
    the explode multiplies rows), thresholded against the corpus token
    total. Shared by the batch (heavy_hitters_tokens) and streaming
    (registry_advanced.streaming_heavy_hitters) sketch entries so the
    recount semantics — tokenization, threshold comparison, rounding —
    cannot diverge from their common oracle."""
    toks = docs.select(
        F.filter(F.split("text", " "), lambda t: t != "").alias("toks")
    )
    total = toks.agg(F.sum(F.size("toks")).alias("total"))
    cand_arr = candidates.agg(
        F.array_sort(F.collect_list("token")).alias("cand")
    )
    counts = (
        toks.crossJoin(F.broadcast(cand_arr))
        .select(
            F.explode(
                F.filter(
                    F.col("toks"),
                    lambda t: F.array_contains(F.col("cand"), t),
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * 100 > F.col("total") * percent)
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") * 100.0 / F.col("total"), 4).alias(
                "pct_of_tokens"
            ),
        )
        .orderBy(F.desc("n_occurrences"), "token")
    )


def heavy_hitters_tokens(spark, sf_dir):
    """EXACT list of tokens owning more than 1% of the corpus token
    stream, found the way a 100 TB job has to: a fixed-size Misra-Gries
    sketch per partition (mapInPandas, 200 counters) produces a
    candidate set of O(partitions x 200) rows no matter how large the
    vocabulary is; an exact recount over the broadcast candidates then
    filters to the true hitters.  The sketch can only over-generate
    (recall = 1 for any token above the 1/201 partition share and the
    1% global share is far above that), so the recount makes the output
    exact and the plain explode + GROUP BY ... HAVING oracle
    hash-matches.

    Scale: the full-vocabulary explode + ``GROUP BY token`` the oracle
    runs is exactly what this shape avoids — no shuffle keyed on a
    billion-term vocabulary; one column-pruned scan for the sketch, one
    explode filtered by the broadcast candidate set (array_contains
    prunes BEFORE the explode multiplies rows) for the recount, one
    1-row total broadcast (allowlisted)."""
    d = _t(spark, sf_dir, "documents").select("text")
    candidates = (
        d.mapInPandas(_misra_gries_partition, "token string").distinct()
    )
    return exact_token_recount(d, candidates, _HH_PERCENT)


HEAVY_HITTERS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), nonempty AS (
  SELECT token FROM tok WHERE token <> ''
), t AS (SELECT count(*) AS total FROM nonempty),
c AS (SELECT token, count(*) AS n_occurrences FROM nonempty GROUP BY 1)
SELECT c.token, c.n_occurrences,
       CAST(round(c.n_occurrences * 100.0 / t.total, 4) AS DOUBLE)
         AS pct_of_tokens
FROM c, t
WHERE c.n_occurrences * 100 > t.total * {_HH_PERCENT}
ORDER BY n_occurrences DESC, token
"""


# =====================================================================
# regex pattern matching over per-user event sequences
# =====================================================================

_PATTERN = "v[ce]*p"  # view, then purchase, with only clicks/errors between


def event_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence analytics: encode each user's
    event history as a string of type initials (event ids are assigned
    in ts order, so sorting by event_id is arrival order), count
    non-overlapping occurrences of the conversion pattern
    'view (click|error)* purchase' with regexp_count, and histogram
    users by match count.

    Scale: ONE shuffle keyed on user_id folds the sequence (same shape
    as sessionization); the regex runs once per user on a
    bounded-length string inside codegen — no Python, no self-join over
    event pairs, no state machine UDF."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.substring("event_type", 1, 1).alias("c")
    )
    paths = e.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_id", "c"))),
                lambda s: s["c"],
            ),
        ).alias("path")
    )
    return (
        paths.select(
            F.regexp_count("path", F.lit(_PATTERN)).alias("match_count"),
            F.length("path").alias("n_events"),
        )
        .groupBy("match_count")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_user"),
        )
        .orderBy("match_count")
    )


EVENT_PATTERN_SQL = f"""
WITH p AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS path
  FROM events GROUP BY 1
)
SELECT len(regexp_extract_all(path, '{_PATTERN}')) AS match_count,
       count(*) AS n_users,
       CAST(round(avg(length(path)), 4) AS DOUBLE) AS avg_events_per_user
FROM p GROUP BY 1 ORDER BY 1
"""


# =====================================================================
# dynamic-gap session windows
# =====================================================================

def dynamic_gap_sessions(spark, sf_dir):
    """Session windows whose gap depends on the EVENT — Spark's dynamic
    ``session_window`` (gap as an expression): a purchase closes its
    session after 60 s, everything else keeps it open for 600 s.  The
    per-user session profile (count, busiest session) must match a
    variable-end gaps-and-islands oracle: each event opens
    [ts, ts+gap(event)) and sessions are the merged islands under a
    running max-end, with the boundary rule mirrored exactly: an event
    whose ts EQUALS the current session end still merges (verified
    against Spark 4.1 on boundary-tie data at sf0.01 — the docs'
    half-open phrasing does not describe the merge rule).

    Timestamps are truncated to whole seconds on BOTH engines before
    sessionizing so the boundary arithmetic is integer-exact.

    Scale: one shuffle keyed on user_id, session merge inside the
    aggregate — the same cost as fixed-gap sessionization; the dynamic
    gap is a codegen expression, not a second pass."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").cast("timestamp").alias("ts_s"),
    )
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 seconds")
    ).otherwise(F.lit("600 seconds"))
    sessions = e.groupBy(
        F.session_window("ts_s", gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


DYNAMIC_GAP_SQL = """
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CASE WHEN event_type = 'purchase' THEN 60 ELSE 600 END AS end_s
  FROM events
), flagged AS (
  SELECT user_id, start_s, end_s, event_id,
         CASE WHEN max(end_s) OVER (PARTITION BY user_id
                                    ORDER BY start_s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) IS NULL
                OR start_s > max(end_s) OVER (PARTITION BY user_id
                                              ORDER BY start_s, event_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                                       AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_s
  FROM iv
), labeled AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY start_s, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx, count(*) AS n_events
  FROM labeled GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, sum(n_events) AS total_events,
       max(n_events) AS max_session_events
FROM sess GROUP BY user_id ORDER BY user_id
"""


# =====================================================================
# checksum / content-integrity battery
# =====================================================================

def checksum_integrity_battery(spark, sf_dir):
    """Content-integrity checksums per source — the fixity report a
    data platform computes at every ingest hop: SHA-256 and MD5 digests
    (both hex, bit-identical across engines), distinct-digest counts
    (== exact-dup detection by another name), and the lexicographic min
    digest as a stable per-source content fingerprint.

    Scale: digests are codegen expressions on the scan; the aggregate
    shuffles 64-byte hex strings, never documents."""
    d = _t(spark, sf_dir, "documents")
    h = d.select(
        "source",
        F.sha2("text", 256).alias("sha"),
        F.md5("text").alias("md5"),
    )
    return (
        h.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("sha").alias("distinct_sha"),
            F.countDistinct("md5").alias("distinct_md5"),
            F.min("sha").alias("min_sha"),
        )
        .orderBy("source")
    )


CHECKSUM_SQL = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT sha256(text)) AS distinct_sha,
       count(DISTINCT md5(text)) AS distinct_md5,
       min(sha256(text)) AS min_sha
FROM documents
GROUP BY source ORDER BY source
"""


# =====================================================================
# capstone: sketch-driven stopword refinery
# =====================================================================

def pipeline_stopword_refinery(spark, sf_dir):
    """Sketches feeding the curation pipeline: the corpus's own heavy
    hitters (tokens above 1% of the stream, found via the Misra-Gries
    sketch + exact recount — never a full-vocabulary shuffle) become
    the stopword list, which broadcasts back over the corpus to strip
    those tokens inside codegen (array filter, no Python).  Reported
    per language: docs, tokens before/after, and the stopword mass
    removed — the data-driven version of the fixed stopword ratios in
    text_quality_scores.

    Scale: stage 1 is the heavy-hitter shape (O(partitions x 200)
    candidates); stage 2 is one scan with a broadcast array membership
    test per token; nothing quadratic, nothing driver-side except the
    tiny stopword list itself."""
    d = _t(spark, sf_dir, "documents")
    hitters = heavy_hitters_tokens(spark, sf_dir).select("token")
    stop_arr = hitters.agg(
        F.array_sort(F.collect_list("token")).alias("stop")
    )
    toks = d.select(
        "doc_id",
        "lang",
        F.filter(F.split("text", " "), lambda t: t != "").alias("toks"),
    )
    cleaned = toks.crossJoin(F.broadcast(stop_arr)).select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        F.size(
            F.filter(
                F.col("toks"),
                lambda t: ~F.array_contains(F.col("stop"), t),
            )
        ).alias("n_kept"),
    )
    return (
        cleaned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_before"),
            F.sum("n_kept").alias("tokens_after"),
            F.round(
                1.0
                - F.sum("n_kept") / F.sum("n_tokens"),
                4,
            ).alias("stopword_mass"),
        )
        .orderBy("lang")
    )


STOPWORD_REFINERY_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), nonempty AS (
  SELECT doc_id, lang, token FROM tok WHERE token <> ''
), t AS (SELECT count(*) AS total FROM nonempty),
stop AS (
  SELECT token FROM nonempty, t
  GROUP BY token, t.total
  HAVING count(*) * 100 > t.total * {_HH_PERCENT}
), per_doc AS (
  SELECT n.doc_id, n.lang,
         count(*) AS n_tokens,
         sum(CASE WHEN s.token IS NULL THEN 1 ELSE 0 END) AS n_kept
  FROM nonempty n LEFT JOIN stop s USING (token)
  GROUP BY 1, 2
)
SELECT lang, count(*) AS n_docs,
       sum(n_tokens) AS tokens_before,
       sum(n_kept) AS tokens_after,
       CAST(round(1.0 - sum(n_kept) * 1.0 / sum(n_tokens), 4) AS DOUBLE)
         AS stopword_mass
FROM per_doc
GROUP BY lang ORDER BY lang
"""


# =====================================================================
# merge overlapping intervals (gaps-and-islands)
# =====================================================================

_ISLAND_SPAN_S = 300  # each event opens a 5-minute activity interval


def merge_intervals_events(spark, sf_dir):
    """Gaps-and-islands: every event opens a 5-minute activity interval;
    overlapping/touching intervals per user merge into islands.  The
    classic rewrite — running max of interval end over the per-user
    ordering, a new-island flag wherever the next start clears it, a
    running sum of flags as the island id — does the whole merge in ONE
    shuffle keyed on user_id with three stacked window functions over
    the same (user_id, start, event_id) sort, so Spark plans a single
    Exchange + Sort.  Output per user: island count, covered seconds,
    and the busiest island's event count.

    Scale: no self-join, no explode of the time axis; cost is the one
    keyed sort regardless of how long users' histories are."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + _ISLAND_SPAN_S).alias("end"),
    )
    order = Window.partitionBy("user_id").orderBy("start", "event_id")
    prev_max_end = F.max("end").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        (F.max("end") - F.min("start")).alias("covered_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("covered_s").alias("covered_s"),
            F.max("n_events").alias("max_island_events"),
        )
        .orderBy("user_id")
    )


MERGE_INTERVALS_SQL = f"""
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
         CAST(floor(epoch(ts)) AS BIGINT) + {_ISLAND_SPAN_S} AS end_s
  FROM events
), flagged AS (
  SELECT user_id, start_s, end_s,
         CASE WHEN max(end_s) OVER (PARTITION BY user_id
                                    ORDER BY start_s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) IS NULL
                OR start_s > max(end_s) OVER (PARTITION BY user_id
                                              ORDER BY start_s, event_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                                       AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM iv
), labeled AS (
  SELECT user_id, start_s, end_s,
         sum(new_island) OVER (PARTITION BY user_id
                               ORDER BY start_s, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), islands AS (
  SELECT user_id, island,
         max(end_s) - min(start_s) AS covered_s,
         count(*) AS n_events
  FROM labeled GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_islands, sum(covered_s) AS covered_s,
       max(n_events) AS max_island_events
FROM islands GROUP BY 1 ORDER BY user_id
"""


# =====================================================================
# grouped Misra-Gries — exact heavy hitters PER DIMENSION
# =====================================================================

def _misra_gries_grouped(batches):
    """Per-source Misra-Gries over Arrow batches: one fixed-capacity
    counter dict PER SOURCE seen in the partition.  With the input
    repartitioned on source, each source's whole stream flows through
    one partition, so the per-source survival guarantee (count_s >
    n_s/(capacity+1) survives) holds exactly as in the global sketch.
    Emits (source, token) candidate keys only."""
    per_source: dict[str, dict[str, int]] = {}
    for pdf in batches:
        for src, text in zip(pdf["source"].astype(str), pdf["text"].astype(str)):
            counters = per_source.setdefault(src, {})
            for tok in text.split(" "):
                if not tok:
                    continue
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < _MG_CAPACITY:
                    counters[tok] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
    rows = [
        (src, tok) for src, counters in per_source.items() for tok in counters
    ]
    if rows:
        yield pd.DataFrame(rows, columns=["source", "token"])


def heavy_hitters_per_source(spark, sf_dir):
    """EXACT heavy hitters PER DIMENSION: tokens above 2% of EACH
    source's token stream, via the grouped Misra-Gries sketch — the
    input repartitions on source so each source's stream meets one
    sketch, candidates are O(sources x capacity), and the exact recount
    joins on the broadcast (source, token) candidate set before a
    per-source threshold filter.  Exact for the same reason as the
    global entry: the sketch only over-generates.

    Scale: the repartition shuffles documents once keyed on source (the
    same key the recount aggregates on); no full-vocabulary x source
    shuffle ever exists.  Skewed sources are the caveat — one giant
    source serializes through one partition; salting + two-level MG
    merge is the refinement documented for that shape."""
    d = _t(spark, sf_dir, "documents").select("source", "text")
    candidates = (
        d.repartition("source")
        .mapInPandas(_misra_gries_grouped, "source string, token string")
        .distinct()
    )
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("token"),
    )
    totals = toks.groupBy("source").agg(F.count(F.lit(1)).alias("total"))
    counts = (
        toks.join(F.broadcast(candidates), ["source", "token"])
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.join(F.broadcast(totals), "source")
        .filter(F.col("n_occurrences") * 50 > F.col("total"))
        .select(
            "source",
            "token",
            "n_occurrences",
            F.round(
                F.col("n_occurrences") * 100.0 / F.col("total"), 4
            ).alias("pct_of_source"),
        )
        .orderBy("source", F.desc("n_occurrences"), "token")
    )


HEAVY_HITTERS_GROUPED_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), nonempty AS (
  SELECT source, token FROM tok WHERE token <> ''
), t AS (SELECT source, count(*) AS total FROM nonempty GROUP BY 1),
c AS (
  SELECT source, token, count(*) AS n_occurrences
  FROM nonempty GROUP BY 1, 2
)
SELECT c.source, c.token, c.n_occurrences,
       CAST(round(c.n_occurrences * 100.0 / t.total, 4) AS DOUBLE)
         AS pct_of_source
FROM c JOIN t USING (source)
WHERE c.n_occurrences * 50 > t.total
ORDER BY c.source, n_occurrences DESC, c.token
"""


# =====================================================================
# KMV (k-minimum-values) approximate distinct count — portable sketch
# =====================================================================

_KMV_K = 64


def approx_distinct_kmv(spark, sf_dir):
    """Approximate distinct users via a K-minimum-values sketch on the
    portable 60-bit MD5 hash: estimate = (k-1) / h_k where h_k is the
    k-th smallest distinct normalized hash.  Unlike HLL (engine-specific
    registers — approx_distinct_users value-gates an error ENVELOPE, not
    the estimate), every
    step here is reproducible arithmetic, so the APPROXIMATE estimate
    itself sits under the cross-engine value gate — DuckDB computes the
    identical sketch and the identical estimate, bit for bit.

    Plan shape: the k smallest hashes come from TakeOrderedAndProject —
    per-partition partial top-k merged on the driver, never a global
    sort.  The distinct() before it shuffles only 8-byte hashes; the
    production variant dedups within the per-partition top-k first so
    the exchange is O(partitions x k) (same discipline as the
    Misra-Gries recount), traded here for the simpler exact-dedup form
    at gate scale.  Output includes the true count and relative error —
    the sketch ships with its own accuracy report."""
    e = _t(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    ).alias("h")
    kmin = e.select(h).distinct().orderBy("h").limit(_KMV_K)
    est = kmin.agg(
        # fewer than k distinct hashes => the sketch holds the whole
        # population and IS the exact count (standard KMV convention)
        F.round(
            F.when(
                F.count(F.lit(1)) < _KMV_K, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(_KMV_K) - 1) / F.max("h")),
            2,
        ).alias("est_distinct"),
        F.count(F.lit(1)).alias("k_used"),
    )
    truth = e.agg(F.countDistinct("user_id").alias("true_distinct"))
    return est.crossJoin(F.broadcast(truth)).select(
        "est_distinct",
        "k_used",
        "true_distinct",
        F.when(F.col("true_distinct") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.abs(F.col("est_distinct") - F.col("true_distinct"))
                / F.col("true_distinct"),
                4,
            )
        )
        .alias("rel_error"),
    )


APPROX_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         AS BIGINT) / CAST({1 << 60} AS DOUBLE) AS h
  FROM events
), kmin AS (
  SELECT h FROM h ORDER BY h LIMIT {_KMV_K}
), est AS (
  SELECT CAST(round(CASE WHEN count(*) < {_KMV_K}
                         THEN CAST(count(*) AS DOUBLE)
                         ELSE ({_KMV_K} - 1) / max(h) END, 2) AS DOUBLE)
           AS est_distinct,
         count(*) AS k_used
  FROM kmin
), t AS (SELECT count(DISTINCT user_id) AS true_distinct FROM events)
SELECT est.est_distinct, est.k_used, t.true_distinct,
       CASE WHEN t.true_distinct = 0 THEN 0.0
            ELSE CAST(round(abs(est.est_distinct - t.true_distinct)
                            / t.true_distinct, 4) AS DOUBLE) END AS rel_error
FROM est, t
"""


# =====================================================================
# grouped KMV — approximate distinct per dimension
# =====================================================================

def kmv_grouped_distinct(spark, sf_dir):
    """Distinct users PER EVENT TYPE via per-group KMV sketches — the
    production shape (distinct per day / per dimension) of the portable
    sketch: one window ranks each group's distinct hashes and keeps the
    k smallest, one aggregate turns each group's sketch into an
    estimate, and the exact count rides along per group as the accuracy
    report.

    Scale: the window partitions by the group key and ranks 8-byte
    hashes — the shuffle carries (type, hash) pairs deduped first, and
    per-group state in the rank is one row; contrast with exact
    count-distinct whose shuffle carries every (type, user) pair to one
    reducer per group regardless of skew."""
    e = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    ).alias("h")
    hashes = e.select("event_type", h).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kmin = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    est = kmin.groupBy("event_type").agg(
        F.round(
            F.when(
                F.count(F.lit(1)) < _KMV_K, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(_KMV_K) - 1) / F.max("h")),
            2,
        ).alias("est_distinct")
    )
    truth = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return (
        est.join(truth, "event_type")
        .select(
            "event_type",
            "est_distinct",
            "true_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("true_distinct"))
                / F.col("true_distinct"),
                4,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


KMV_GROUPED_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         AS BIGINT) / CAST({1 << 60} AS DOUBLE) AS h
  FROM events
), kmin AS (
  SELECT event_type, h FROM h
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h)
          <= {_KMV_K}
), est AS (
  SELECT event_type,
         CAST(round(CASE WHEN count(*) < {_KMV_K}
                         THEN CAST(count(*) AS DOUBLE)
                         ELSE ({_KMV_K} - 1) / max(h) END, 2) AS DOUBLE)
           AS est_distinct
  FROM kmin GROUP BY 1
), t AS (
  SELECT event_type, count(DISTINCT user_id) AS true_distinct
  FROM events GROUP BY 1
)
SELECT est.event_type, est.est_distinct, t.true_distinct,
       CAST(round(abs(est.est_distinct - t.true_distinct)
                  / t.true_distinct, 4) AS DOUBLE) AS rel_error
FROM est JOIN t USING (event_type)
ORDER BY est.event_type
"""


# =====================================================================
# KMV set operations — sketch MERGEABILITY (union from sketches alone)
# =====================================================================

def kmv_set_operations(spark, sf_dir):
    """The property that makes sketches distributed-systems citizens:
    MERGEABILITY.  Distinct-user sketches for the click cohort and the
    purchase cohort are built independently; the UNION estimate comes
    from merging the two k-minimum sets alone (k smallest of the
    combined sketch hashes — the raw cohorts are never rescanned), and
    the intersection follows by inclusion-exclusion.  True counts ride
    along as the accuracy report.  Same portable MD5-60 hash as
    approx_distinct_kmv, so DuckDB reproduces every estimate bit for
    bit.

    Scale: per-cohort sketches are TakeOrderedAndProject partial top-k;
    the merge handles O(k) rows — this is exactly how per-partition /
    per-day sketches roll up to a global estimate without a second pass
    over 100 TB."""
    e = _t(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    ).alias("h")

    def sketch(df):
        return df.select(h).distinct().orderBy("h").limit(_KMV_K)

    def estimate(sk, name):
        return sk.agg(
            F.round(
                F.when(
                    F.count(F.lit(1)) < _KMV_K,
                    F.count(F.lit(1)).cast("double"),
                ).otherwise((F.lit(_KMV_K) - 1) / F.max("h")),
                2,
            ).alias(name)
        )

    clicks = e.filter(F.col("event_type") == "click")
    buys = e.filter(F.col("event_type") == "purchase")
    sk_a, sk_b = sketch(clicks), sketch(buys)
    # merge: k smallest of the two SKETCHES' hashes — no data rescan
    sk_u = sk_a.unionAll(sk_b).distinct().orderBy("h").limit(_KMV_K)

    est = (
        estimate(sk_a, "est_clickers")
        .crossJoin(F.broadcast(estimate(sk_b, "est_buyers")))
        .crossJoin(F.broadcast(estimate(sk_u, "est_union")))
    )
    truth = e.filter(
        F.col("event_type").isin("click", "purchase")
    ).agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("true_clickers"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("true_buyers"),
        F.countDistinct("user_id").alias("true_union"),
    )
    return est.crossJoin(F.broadcast(truth)).select(
        "est_clickers",
        "est_buyers",
        "est_union",
        F.round(
            F.col("est_clickers") + F.col("est_buyers") - F.col("est_union"),
            2,
        ).alias("est_intersection"),
        "true_clickers",
        "true_buyers",
        "true_union",
        (
            F.col("true_clickers") + F.col("true_buyers")
            - F.col("true_union")
        ).alias("true_intersection"),
    )


KMV_SETOPS_SQL = f"""
WITH ha AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         AS BIGINT) / CAST({1 << 60} AS DOUBLE) AS h
  FROM events WHERE event_type = 'click'
  ORDER BY h LIMIT {_KMV_K}
), hb AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         AS BIGINT) / CAST({1 << 60} AS DOUBLE) AS h
  FROM events WHERE event_type = 'purchase'
  ORDER BY h LIMIT {_KMV_K}
), hu AS (
  SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
  ORDER BY h LIMIT {_KMV_K}
), ea AS (
  SELECT CAST(round(CASE WHEN count(*) < {_KMV_K}
                         THEN CAST(count(*) AS DOUBLE)
                         ELSE ({_KMV_K} - 1) / max(h) END, 2) AS DOUBLE)
           AS est_clickers FROM ha
), eb AS (
  SELECT CAST(round(CASE WHEN count(*) < {_KMV_K}
                         THEN CAST(count(*) AS DOUBLE)
                         ELSE ({_KMV_K} - 1) / max(h) END, 2) AS DOUBLE)
           AS est_buyers FROM hb
), eu AS (
  SELECT CAST(round(CASE WHEN count(*) < {_KMV_K}
                         THEN CAST(count(*) AS DOUBLE)
                         ELSE ({_KMV_K} - 1) / max(h) END, 2) AS DOUBLE)
           AS est_union FROM hu
), t AS (
  SELECT count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
           AS true_clickers,
         count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
           AS true_buyers,
         count(DISTINCT user_id) AS true_union
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT ea.est_clickers, eb.est_buyers, eu.est_union,
       CAST(round(ea.est_clickers + eb.est_buyers - eu.est_union, 2)
            AS DOUBLE) AS est_intersection,
       t.true_clickers, t.true_buyers, t.true_union,
       t.true_clickers + t.true_buyers - t.true_union AS true_intersection
FROM ea, eb, eu, t
"""


# =====================================================================
# Count-Min sketch point-frequency audit — portable, integer-exact
# =====================================================================

_CM_ROWS = [(31, 7), (131, 43), (8191, 101), (65537, 9)]  # (A_r, B_r)
_CM_P = 1048573  # prime
_CM_W = 256


def _cm_bucket_expr(h30, a, b):
    return ((h30 * a + b) % _CM_P) % _CM_W


def countmin_error_audit(spark, sf_dir):
    """Count-Min sketch over the corpus token stream with a PORTABLE
    hash family (MD5-60 folded to 30 bits, then 4 affine rows mod a
    prime): the sketch table is a (4 x 256) integer counter matrix
    built by one groupBy, the per-token estimate is the min over its 4
    cells, and the audit reports estimate vs exact count per token —
    overcount is provably >= 0, and every number is integer arithmetic
    DuckDB reproduces exactly, so the whole sketch sits under the value
    gate.

    Scale: the sketch build shuffles (row, bucket) pairs — at most
    4 x 256 groups regardless of vocabulary size (the mergeable-counter
    property that makes CM the streaming-frequency workhorse); the
    exact recount exists only for the audit."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("token")
    )
    h30 = (
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
        .cast("long") % (1 << 30)
    )
    withb = toks.select(
        "token",
        *[
            _cm_bucket_expr(h30, a, b).alias(f"b{r}")
            for r, (a, b) in enumerate(_CM_ROWS)
        ],
    )
    cells = withb.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), F.col(f"b{r}").alias("bucket")
                    )
                    for r in range(len(_CM_ROWS))
                ]
            )
        ).alias("c")
    ).select(F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
    cm = cells.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("n"))

    per_token = withb.groupBy(
        "token", *[f"b{r}" for r in range(len(_CM_ROWS))]
    ).agg(F.count(F.lit(1)).alias("exact"))
    probes = per_token.select(
        "token",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), F.col(f"b{r}").alias("bucket")
                    )
                    for r in range(len(_CM_ROWS))
                ]
            )
        ).alias("c"),
    ).select("token", "exact", F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(cm), ["r", "bucket"])
        .groupBy("token", "exact")
        .agg(F.min("n").alias("cm_estimate"))
    )
    return est.select(
        "token",
        "exact",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact")).alias("overcount"),
    ).orderBy("token")


def _cm_bucket_sql(a, b):
    return f"(((h30 * {a} + {b}) % {_CM_P}) % {_CM_W})"


COUNTMIN_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), nonempty AS (
  SELECT token FROM tok WHERE token <> ''
), hashed AS (
  SELECT token,
         CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT)
           % {1 << 30} AS h30
  FROM nonempty
), withb AS (
  SELECT token,
         {", ".join(_cm_bucket_sql(a, b) + f" AS b{r}" for r, (a, b) in enumerate(_CM_ROWS))}
  FROM hashed
), cells AS (
  {" UNION ALL ".join(f"SELECT {r} AS r, b{r} AS bucket FROM withb" for r in range(len(_CM_ROWS)))}
), cm AS (
  SELECT r, bucket, count(*) AS n FROM cells GROUP BY 1, 2
), per_token AS (
  SELECT token, {", ".join(f"b{r}" for r in range(len(_CM_ROWS)))},
         count(*) AS exact
  FROM withb GROUP BY ALL
), probes AS (
  {" UNION ALL ".join(f"SELECT token, exact, {r} AS r, b{r} AS bucket FROM per_token" for r in range(len(_CM_ROWS)))}
), est AS (
  SELECT p.token, p.exact, min(cm.n) AS cm_estimate
  FROM probes p JOIN cm USING (r, bucket)
  GROUP BY 1, 2
)
SELECT token, exact, cm_estimate, cm_estimate - exact AS overcount
FROM est ORDER BY token
"""


REGISTRY_ANALYTICS4 = {
    "approx_distinct_kmv": QuerySpec(approx_distinct_kmv, APPROX_KMV_SQL),
    "heavy_hitters_per_source": QuerySpec(
        heavy_hitters_per_source, HEAVY_HITTERS_GROUPED_SQL
    ),
    "countmin_error_audit": QuerySpec(countmin_error_audit, COUNTMIN_SQL),
    "kmv_set_operations": QuerySpec(kmv_set_operations, KMV_SETOPS_SQL),
    "kmv_grouped_distinct": QuerySpec(kmv_grouped_distinct, KMV_GROUPED_SQL),
    "dynamic_gap_sessions": QuerySpec(dynamic_gap_sessions, DYNAMIC_GAP_SQL),
    "checksum_integrity_battery": QuerySpec(
        checksum_integrity_battery, CHECKSUM_SQL
    ),
    "pipeline_stopword_refinery": QuerySpec(
        pipeline_stopword_refinery, STOPWORD_REFINERY_SQL
    ),
    "zorder_layout_audit": QuerySpec(zorder_layout_audit, ZORDER_SQL),
    "heavy_hitters_tokens": QuerySpec(heavy_hitters_tokens, HEAVY_HITTERS_SQL),
    "event_pattern_match": QuerySpec(event_pattern_match, EVENT_PATTERN_SQL),
    "merge_intervals_events": QuerySpec(
        merge_intervals_events, MERGE_INTERVALS_SQL
    ),
}
