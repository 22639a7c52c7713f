"""Advanced round-2 additions: streaming sketch state, exact distributed
quantiles, and BFS hop distance.

Three operator families a reference user graduating to 100 TB needs:

- ``streaming_heavy_hitters``: the batch Misra-Gries entry
  (registry_analytics4.heavy_hitters_tokens) rebuilt as a TRUE streaming
  operator — per-bucket sketches live in the state store across
  micro-batches, the exact recount runs batch-side after the stream
  drains. This is the deferred "streaming Misra-Gries via stateful
  aggregation" item from SCALE_DESIGN.md.
- ``exact_quantiles_two_pass``: EXACT order statistics without a global
  sort — the histogram-then-probe algorithm every distributed engine
  uses when approx_percentile isn't acceptable.
- ``bfs_customer_supplier_hops``: minimum hop distance over the
  customer↔supplier bipartite graph (operators/graph.bfs_hops), checked
  against a DuckDB recursive-CTE oracle.

Reference parity note: the reference (Soostone/kinesis-app) has no query
surface at all (Processor at src/Kinesis/Coordination.hs:51-53 is the
whole computation API); these entries extend the forward-defined engine
surface of SURVEY.md §2.2 (sketches, iterative algorithms, streaming
state).
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import Window, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from kinesis_app_spark.streaming.ops import GATE_STREAM_SHUFFLE
from kinesis_app_spark.scratch import scratch_dir
from kinesis_app_spark.operators.graph import bfs_hops
from kinesis_app_spark.operators.rankstats import values_at_ranks
from kinesis_app_spark.registry_util import QuerySpec, table as _t
from kinesis_app_spark.streaming.ops import run_to_memory
from kinesis_app_spark.streaming.sources import file_stream


# =====================================================================
# streaming heavy hitters: Misra-Gries in the state store
# =====================================================================

_SMG_CAPACITY = 200  # recall = 1 for any token with share > 1/201
_SMG_BUCKETS = 8  # sketch shards; all occurrences of a token hit ONE shard
_SMG_PERCENT = 1  # report tokens owning > 1% of the token stream


def _multi_file_stream(spark, dfs, schema, cache_key):
    """Source dir with one data file PER DataFrame, consumed one per
    micro-batch (mtime-ordered, maxFilesPerTrigger=1), so stateful
    operators provably merge state across batches and watermark
    advancement between batches is deterministic. Every file is written
    by Spark (no driver-side row collection); files after the first are
    moved in with bumped mtimes. Dir is memoized like _mk_stream's."""
    from kinesis_app_spark.registry_streaming import _SRC_CACHE

    # key in the schema so a future projection edit in ONE of the sharing
    # entries cannot silently serve the other null-filled columns from a
    # stale dir (parquet reads by name; absent columns come back null)
    cache_key = f"{cache_key}|{schema.simpleString()}"
    src = _SRC_CACHE.get(cache_key)
    if src is None:
        src = tempfile.mkdtemp(prefix="streamn_src_")
        dfs[0].coalesce(1).write.mode("overwrite").parquet(src)
        for i, df in enumerate(dfs[1:], start=1):
            tmp = tempfile.mkdtemp(prefix="streamn_tmp_")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet")
            )
            newest = max(
                os.stat(os.path.join(src, f)).st_mtime
                for f in os.listdir(src)
            )
            dst = os.path.join(
                src, f"file{i}-{uuid.uuid4().hex[:8]}.parquet"
            )
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (newest + 5, newest + 5))
            shutil.rmtree(tmp, ignore_errors=True)
        _SRC_CACHE[cache_key] = src
    ckpt = scratch_dir("streamn_ckpt_")
    return file_stream(spark, src, schema, max_files_per_trigger=1), ckpt


def _mg_state_fn(key, pdfs, state):
    """Per-bucket Misra-Gries sketch persisted in the state store.

    Batched decrement variant: fold each Arrow batch's value_counts into
    the counters, then shrink once by d = the (capacity+1)-th largest
    value, dropping counters ≤ d. Each shrink removes ≥ (capacity+1)·d
    total mass, so the decrement any single token ever absorbs is
    ≤ n_bucket/(capacity+1) summed over the whole stream — the classic
    Misra-Gries bound, which means any token with bucket share >
    1/(capacity+1) keeps a counter. Token→bucket hashing routes EVERY
    occurrence of a token to one sketch, so bucket share ≥ global share
    and recall is 1 for anything above the global 1/(capacity+1) line;
    the sketch only over-generates and the exact recount fixes precision.
    """
    if state.exists:
        toks, cnts = state.get
        counters = dict(zip(list(toks), (int(c) for c in cnts)))
    else:
        counters = {}
    for pdf in pdfs:
        for tok, c in pdf["token"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > _SMG_CAPACITY:
            vals = sorted(counters.values(), reverse=True)
            d = vals[_SMG_CAPACITY]
            counters = {t: v - d for t, v in counters.items() if v > d}
    state.update((list(counters.keys()), list(counters.values())))
    yield pd.DataFrame({"token": list(counters.keys())})


def streaming_heavy_hitters(spark, sf_dir):
    """EXACT heavy hitters (>1% of the corpus token stream) discovered by
    a TRUE streaming query: documents arrive over two micro-batches, the
    stream explodes to tokens routed to 8 sketch shards by token hash,
    and ``applyInPandasWithState`` maintains one Misra-Gries sketch per
    shard in the state store ACROSS batches (update-mode emission). The
    union of emitted candidates (over-generating by construction) is
    recounted exactly batch-side against the static table, so the final
    list hash-matches the plain GROUP BY ... HAVING oracle.

    Scale: state is O(buckets × capacity) regardless of vocabulary; the
    streaming shuffle is keyed on a FIXED 8-value bucket domain (sketch
    shards — the storm-style topology), never on the vocabulary; the
    recount is the batch entry's broadcast-candidates + filtered-explode
    plan (registry_analytics4.heavy_hitters_tokens). The two-file source
    proves cross-batch state merge rather than a single-batch degenerate
    run."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    stream, ckpt = _multi_file_stream(
        spark,
        [
            d.filter(F.col("doc_id") % 2 == 0),
            d.filter(F.col("doc_id") % 2 == 1),
        ],
        d.schema,
        cache_key=f"{sf_dir}|docs_2file",
    )
    tokens = stream.select(
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("token")
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("token"), F.lit(_SMG_BUCKETS)).cast("int")
    )
    cands = tokens.groupBy("bucket").applyInPandasWithState(
        _mg_state_fn,
        outputStructType="token string",
        stateStructType="tokens array<string>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = run_to_memory(
        cands, ckpt, output_mode="update", shuffle_partitions=_SMG_BUCKETS
    )
    candidates = emitted.select("token").distinct()

    # exact recount over the static table, pruned by broadcast candidates
    # (shared with the batch sketch entry so semantics cannot diverge)
    from kinesis_app_spark.registry_analytics4 import exact_token_recount

    return exact_token_recount(d.select("text"), candidates, _SMG_PERCENT)


STREAMING_HH_SQL = f"""
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
WHERE c.n_occurrences * 100 > t.total * {_SMG_PERCENT}
ORDER BY n_occurrences DESC, token
"""


# =====================================================================
# exact quantiles without a global sort
# =====================================================================

_QUANTILES = (0.5, 0.9, 0.99)
_QNT_BUCKETS = 1024


def exact_quantiles_two_pass(spark, sf_dir):
    """EXACT quantiles of l_extendedprice with NO global sort, via the
    shared ``operators/rankstats.py`` primitive: pass 0 computes
    (count, min, max) — one row to the driver; pass 1 histograms the
    column into 1024 fixed-width buckets — ≤1024 rows to the driver
    (both bounded collects, same discipline as IVF centroids); the
    cumulative histogram locates, for each target rank ceil(q·n)-1
    (DuckDB's quantile_disc rank, verified), the bucket holding it and
    the offset within that bucket. Pass 2 then reads ONLY that bucket's
    rows (a pushed-down range predicate on the parquet scan, plus the
    exact bucket expression to kill float-boundary ambiguity) and takes
    the offset-th smallest via orderBy+limit — a TakeOrderedAndProject
    over ~n/1024 rows, never a sort of n.

    Scale: the full sort this avoids is THE bottleneck of naive exact
    percentiles at 100 TB; the only full-data passes are scan+aggregate
    jobs (codegen, column-pruned). Pathological skew (one bucket ≫
    n/1024) RE-HISTOGRAMS inside the bucket instead of sorting it —
    see rankstats._value_at_rank and tests/test_round3.py."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    n = li.count()
    if n == 0:  # empty table: no ranks exist
        return spark.createDataFrame([], "quantile double, value double")
    rank_of = {q: math.ceil(q * n) - 1 for q in _QUANTILES}
    vals = values_at_ranks(li, "x", list(rank_of.values()),
                           buckets=_QNT_BUCKETS)
    return spark.createDataFrame(
        [(float(q), float(vals[r])) for q, r in sorted(rank_of.items())],
        "quantile double, value double",
    )


EXACT_QUANTILES_SQL = """
SELECT CAST(0.5 AS DOUBLE) AS quantile,
       quantile_disc(l_extendedprice, 0.5) AS value FROM lineitem
UNION ALL
SELECT CAST(0.9 AS DOUBLE), quantile_disc(l_extendedprice, 0.9) FROM lineitem
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_disc(l_extendedprice, 0.99) FROM lineitem
ORDER BY quantile
"""


# =====================================================================
# deterministic late-data drop (watermark contract, append mode)
# =====================================================================

_LATE_CUT = "2024-01-03 00:00:00"  # events span 2024-01-01..01-30 at every sf


def streaming_late_data_drop(spark, sf_dir):
    """Deterministic demonstration of the watermark DROPPING late data —
    the contract the reference's at-least-once redelivery model never
    had (src/Kinesis/Coordination.hs:329-337 re-delivers without any
    event-time bound; a watermark is the bound).

    Four mtime-ordered files, one micro-batch each:
      1. the early cohort (ts < Jan 3) MINUS a withheld 10% slice, PLUS
         the global max-(ts, event_id) row as watermark pusher — the
         watermark computed from this batch stands at ~Jan 30,
      2. a filler batch (the rank-2 row by (ts, event_id)) whose only
         job is to age the pusher's watermark by one batch (see the
         determinism note),
      3. the withheld slice — every row maps to an hour window whose
         end is far below the late-event watermark, so Spark drops ALL
         of them,
      4. a far-future sentinel that flushes the Jan-30 windows.

    The oracle counts the early cohort minus the withheld slice plus
    the two newest rows: what the watermark drops is exactly the
    withheld slice — a value-gated fact rather than folklore.

    Determinism note (pinned empirically on Spark 4.1; the 3.4+
    two-watermark design for chained stateful operators): batch N's
    LATE-EVENT filter uses the watermark that was ACTIVE DURING batch
    N-1 (i.e. computed from batch N-2's data), while EVICTION uses the
    watermark updated from batch N-1's data. Hence the pusher rides TWO
    batches before the late rows: in the naive "bulk, pusher, late"
    layout the late batch still filters with the bulk batch's low
    watermark and admits every late row into any window newer than it
    (observed: windows past max(bulk ts) - delay leaked through)."""
    base = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 300)
        .select("event_id", "ts", "event_type")
    )
    early = base.filter(F.col("ts") < F.lit(_LATE_CUT).cast("timestamp"))
    w_rank = Window.orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = base.withColumn("rn", F.row_number().over(w_rank))
    pusher = ranked.filter(F.col("rn") == 1).drop("rn")
    filler = ranked.filter(F.col("rn") == 2).drop("rn")
    file1 = early.filter(F.col("event_id") % 10 != 0).unionByName(pusher)
    late = early.filter(F.col("event_id") % 10 == 0)
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("zz").alias("event_type"),
    )
    stream, ckpt = _multi_file_stream(
        spark,
        [file1, filler, late, sentinel],
        base.schema,
        cache_key=f"{sf_dir}|late_drop_4file",
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    res = run_to_memory(agg, ckpt, output_mode="append", shuffle_partitions=GATE_STREAM_SHUFFLE)
    return res.filter(F.col("event_type") != "zz").select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
    )


STREAMING_LATE_DROP_SQL = f"""
WITH base AS (
  SELECT event_id, ts, event_type FROM events WHERE user_id < 300
), newest2 AS (
  SELECT * FROM base
  QUALIFY row_number() OVER (ORDER BY ts DESC, event_id DESC) <= 2
), survivors AS (
  SELECT * FROM base
  WHERE ts < TIMESTAMP '{_LATE_CUT}' AND event_id % 10 != 0
  UNION ALL
  SELECT * FROM newest2
)
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
         AS window_start,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000
                      + 3600000000) AS window_end,
       event_type, count(*) AS n_events
FROM survivors
GROUP BY 1, 2, 3
"""


_GQ_QUANTILE = 0.5  # grouped median


def exact_grouped_quantiles(spark, sf_dir):
    """EXACT per-group median of l_extendedprice (by l_returnflag) with
    no per-group sort, via the shared keyed rank-statistics primitive
    (``operators/rankstats.values_at_ranks_by_key``): ONE stats
    aggregate discovers the groups and their counts (the median rank is
    a callable of each group's own n), ONE scan builds the
    (group, bucket) histogram (groups × 1024 rows to the driver —
    bounded by the group domain, the same small-collect contract as the
    global entry above), and ONE probe job ranks within each group's
    single target bucket — sorting ~n_g/1024 rows per group instead of
    n_g. A pathologically heavy (group, bucket) cell re-histograms
    recursively instead of being sorted (inherited from the primitive).

    Scale: the naive per-group exact percentile sorts every group
    (Spark's percentile() aggregate buffers all values per group); this
    shape does three codegen scan+aggregates plus a probe over ~1/1024
    of the data — and generalizes to any quantile set. Group-domain
    caveat: the histogram collect is (n_groups × buckets); for
    high-cardinality groups, batch the group domain or drop to
    percentile_approx."""
    from kinesis_app_spark.operators.rankstats import values_at_ranks_by_key

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("x")
    )
    medians = values_at_ranks_by_key(
        li, "g", "x",
        lambda n: [math.ceil(_GQ_QUANTILE * n) - 1],
        buckets=_QNT_BUCKETS,
    )
    return spark.createDataFrame(
        sorted(
            (g, float(_GQ_QUANTILE), float(next(iter(vals.values()))))
            for g, vals in medians.items()
        ),
        "l_returnflag string, quantile double, value double",
    )


EXACT_GROUPED_QUANTILES_SQL = f"""
SELECT l_returnflag, CAST({_GQ_QUANTILE} AS DOUBLE) AS quantile,
       quantile_disc(l_extendedprice, {_GQ_QUANTILE}) AS value
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# =====================================================================
# BFS hop distance over the customer-supplier bipartite graph
# =====================================================================

_BFS_SEED_NATION = 7
_BFS_MAX_HOPS = 3


def bfs_customer_supplier_hops(spark, sf_dir):
    """Minimum hop distance from NATION_7's customers over the bipartite
    trade graph (customer —ordered-from— supplier, edges from
    lineitem⋈orders): hop 0 = the seed customers, hop 1 = suppliers who
    shipped to them, hop 2 = other customers of those suppliers, hop 3 =
    that cohort's other suppliers. The k-hop neighborhood query —
    blast-radius analysis, GNN frontier sampling — delegated to
    operators/graph.bfs_hops (broadcast frontier per round, static edge
    list partitioned+checkpointed once, visited-set anti-join = min-hop
    by induction). Oracle: DuckDB recursive CTE with min(hop) per node."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == _BFS_SEED_NATION)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
    )
    return bfs_hops(edges, seeds, max_hops=_BFS_MAX_HOPS).orderBy(
        "hop", "node"
    )


BFS_HOPS_SQL = f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), walk(node, hop) AS (
  SELECT 'c:' || c_custkey, 0 FROM customer
  WHERE c_nationkey = {_BFS_SEED_NATION}
  UNION
  SELECT CASE WHEN w.node = e.c THEN e.s ELSE e.c END, w.hop + 1
  FROM walk w JOIN e ON w.node = e.c OR w.node = e.s
  WHERE w.hop < {_BFS_MAX_HOPS}
)
SELECT node, CAST(min(hop) AS INTEGER) AS hop
FROM walk GROUP BY node ORDER BY hop, node
"""


# =====================================================================
# embedding int8 quantization audit
# =====================================================================


def embedding_int8_quantization(spark, sf_dir):
    """Per-dimension INT8 quantization audit for the embedding store —
    the 4× compression every 100 TB vector corpus runs before ANN
    serving. Each dimension gets an affine code ((x-min)/scale, 255
    levels); the audit reports the per-dim range and the reconstruction
    error (max |err| and decimal-exact sum of squared errors), which is
    what decides whether int8 is safe for the recall target.

    Portability discipline: quantization uses floor(u + 0.5) (not
    round-half-even), error sums accumulate in DECIMAL(38,30) so
    aggregation order cannot change a bit, and floats widen to double
    before any arithmetic — the same cross-engine-exact rules as the
    portable-sketch suite (SCALE_DESIGN.md). Scale: one posexplode
    shuffle keyed on dim (bounded by the dimensionality), stats
    broadcast back; everything else is codegen arithmetic."""
    e = _t(spark, sf_dir, "embeddings").select("embedding")
    x = e.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    stats = x.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = x.join(F.broadcast(stats), "dim")
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    q = F.when(scale == 0, F.lit(0.0)).otherwise(
        F.least(
            F.lit(255.0),
            F.greatest(
                F.lit(0.0),
                F.floor((F.col("x") - F.col("mn")) / scale + F.lit(0.5)),
            ),
        )
    )
    err = F.col("x") - (F.col("mn") + q * scale)
    return (
        j.select("dim", "mn", "mx", err.alias("err"))
        .groupBy("dim", "mn", "mx")
        .agg(
            F.round(F.max(F.abs(F.col("err"))), 9).alias("max_abs_err"),
            F.round(
                F.sum((F.col("err") * F.col("err")).cast("decimal(38,30)")),
                12,
            )
            .cast("double")
            .alias("sse"),
        )
        .select(
            "dim",
            F.round("mn", 6).alias("mn"),
            F.round("mx", 6).alias("mx"),
            "max_abs_err",
            "sse",
        )
        .orderBy("dim")
    )


EMBEDDING_INT8_SQL = """
WITH x AS (
  SELECT unnest(range(len(embedding))) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), s AS (
  SELECT dim, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1
), j AS (
  SELECT x.dim, x.x, s.mn, s.mx, (s.mx - s.mn) / 255.0 AS scale
  FROM x JOIN s USING (dim)
), e AS (
  SELECT dim, mn, mx,
         x - (mn + CASE WHEN scale = 0 THEN 0.0
                        ELSE least(255.0, greatest(0.0,
                               floor((x - mn) / scale + 0.5))) END
                   * scale) AS err
  FROM j
)
SELECT dim, round(mn, 6) AS mn, round(mx, 6) AS mx,
       round(max(abs(err)), 9) AS max_abs_err,
       CAST(round(sum(CAST(err * err AS DECIMAL(38,30))), 12) AS DOUBLE)
         AS sse
FROM e GROUP BY dim, mn, mx ORDER BY dim
"""


# =====================================================================
# scan-free statistics: parquet footer aggregate pushdown
# =====================================================================


def metadata_only_stats(spark, sf_dir):
    """COUNT/MIN/MAX answered from parquet FOOTER metadata — zero data
    pages read. The V2 parquet source with
    ``spark.sql.parquet.aggregatePushdown`` pushes whole-table COUNT(*),
    MIN and MAX into the scan, which answers them from row-group
    statistics; the plan is asserted to carry ``PushedAggregation`` for
    every table, so this entry FAILS rather than silently degrading to a
    full scan. At 100 TB this is the difference between a row-count
    taking milliseconds of footer reads and a full-corpus scan — the
    first tool of any data-platform ops surface.

    Conf discipline: the V2-source + pushdown confs are scoped with the
    eager-localCheckpoint pattern (registry_scale.bucketed_join_orders):
    the aggregates EXECUTE under the confs, then everything is restored.
    """
    tables = [
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("customer", "c_custkey"),
    ]
    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        out = None
        for t, key in tables:
            df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
            # min/max on the RAW column (cast AFTER the aggregate): a cast
            # under the agg only pushes down while the optimizer happens to
            # elide it, so the raw-column form is what guarantees the
            # footer-only translation
            agg = df.agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.min(key).cast("long").alias("min_key"),
                F.max(key).cast("long").alias("max_key"),
            )
            plan = agg._jdf.queryExecution().executedPlan().toString()
            for needle in ("COUNT(*)", f"MIN({key})", f"MAX({key})"):
                if (
                    "PushedAggregation: [" not in plan
                    or needle not in plan.split("PushedAggregation: [", 1)[1]
                ):
                    raise RuntimeError(
                        f"aggregate pushdown missing {needle} for {t}: "
                        "footer-only stats would silently degrade to a "
                        "full scan"
                    )
            out = agg if out is None else out.unionByName(agg)
        return out.orderBy("table_name").localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)


METADATA_ONLY_SQL = """
SELECT 'customer' AS table_name, count(*) AS n_rows,
       min(c_custkey) AS min_key, max(c_custkey) AS max_key FROM customer
UNION ALL
SELECT 'lineitem', count(*), min(l_orderkey), max(l_orderkey) FROM lineitem
UNION ALL
SELECT 'orders', count(*), min(o_orderkey), max(o_orderkey) FROM orders
ORDER BY table_name
"""


# =====================================================================
# runtime bloom-filter join (the 100 TB shuffle-join optimization)
# =====================================================================


def runtime_bloom_join(spark, sf_dir):
    """Shuffle join where Spark INJECTS a bloom filter from the selective
    side into the fact scan at optimization time
    (``spark.sql.optimizer.runtime.bloomFilter``): the filter on orders
    (totalprice > 450k keeps ~1%) builds a bloom of surviving orderkeys
    that prunes lineitem rows BEFORE the shuffle — the runtime-filter
    mechanism that, at 100 TB, turns a full-fact-table exchange into an
    exchange of just the matching slice. Broadcast is disabled so the
    join genuinely exercises the shuffle path, and the plan is asserted
    to contain the bloom probe (``might_contain``), so regression to an
    unfiltered shuffle fails loudly. Values are unchanged by the filter
    (bloom false-positives only ADMIT rows; the join still decides) —
    which is what the oracle verifies.

    The application-side size threshold is lowered for the gate-scale
    fixture (default 10 GB — the mechanism is size-gated in production
    exactly because blooms only pay off on big scans)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
        li = _t(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(
                    F.sum(
                        (
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))
                        ).cast("decimal(30,8)")
                    ),
                    2,
                )
                .cast("double")
                .alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        if "might_contain" not in plan:
            raise RuntimeError(
                "runtime bloom filter was not injected; the fact scan "
                "would shuffle unpruned"
            )
        return j.localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


RUNTIME_BLOOM_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,8))), 2)::DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 450000
GROUP BY 1 ORDER BY 1
"""


# =====================================================================
# SQL table function (parameterized relational view, Spark 4 SQL UDTF)
# =====================================================================


def sql_table_function_cohort(spark, sf_dir):
    """Parameterized TABLE function in pure SQL (Spark 4 ``CREATE
    FUNCTION ... RETURNS TABLE``): ``adv_big_orders(threshold)`` is a
    reusable relational view with a runtime argument — the catalog-level
    abstraction a platform exposes so every team doesn't re-paste the
    cohort definition. The function body is ordinary SQL (filter on the
    threshold parameter), composed here with a join + rollup over the
    returned table. Catalyst inlines the function body, so the composed
    plan optimizes exactly like the hand-written query — zero
    abstraction cost (same inlining contract as SQL scalar UDFs,
    registry_modern.sql_udf_net_revenue)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("adv_ordv")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("adv_custv")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION adv_big_orders(
            threshold DOUBLE
        ) RETURNS TABLE (
            o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE
        ) RETURN
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM adv_ordv WHERE o_totalprice > adv_big_orders.threshold
        """
    )
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               CAST(round(sum(CAST(b.o_totalprice AS DECIMAL(30,8))), 2)
                    AS DOUBLE) AS total_price
        FROM adv_big_orders(400000.0D) b
        JOIN adv_custv c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


SQL_TABLE_FUNCTION_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
         AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 400000.0
GROUP BY 1 ORDER BY 1
"""


# =====================================================================
# cached-plan reuse + null-safe join semantics
# =====================================================================


def cached_plan_reuse(spark, sf_dir):
    """Two aggregates served from ONE cached scan: the filtered
    projection is ``.cache()``d, the first aggregate materializes it,
    and the second's physical plan is asserted to read
    ``InMemoryTableScan`` — the multi-query working-set pattern (an
    interactive session, a dashboard fan-out) where re-scanning 100 TB
    per panel is the difference between seconds and hours. Both results
    execute eagerly inside the cache scope (same conf-scoping discipline
    as registry_scale.bucketed_join_orders), then the cache is released:
    no persistent session state leaks to later queries."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .select("l_returnflag", "l_quantity", "l_extendedprice")
    )
    cached = li.cache()
    try:
        a = (
            cached.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("double").alias("metric_value"))
            .withColumn("metric", F.lit("n_rows"))
        )
        b = (
            cached.groupBy("l_returnflag")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(30,8)")), 2
                )
                .cast("double")
                .alias("metric_value")
            )
            .withColumn("metric", F.lit("sum_price"))
        )
        plan = b._jdf.queryExecution().executedPlan().toString()
        if "InMemoryTableScan" not in plan:
            raise RuntimeError(
                "cached scan not reused: second aggregate re-reads parquet"
            )
        out = (
            a.unionByName(b)
            .select("metric", "l_returnflag", "metric_value")
            .orderBy("metric", "l_returnflag")
        )
        return out.localCheckpoint(eager=True)
    finally:
        cached.unpersist()


CACHED_REUSE_SQL = """
WITH f AS (
  SELECT l_returnflag, l_extendedprice FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
)
SELECT 'n_rows' AS metric, l_returnflag,
       CAST(count(*) AS DOUBLE) AS metric_value
FROM f GROUP BY l_returnflag
UNION ALL
SELECT 'sum_price', l_returnflag,
       round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2)::DOUBLE
FROM f GROUP BY l_returnflag
ORDER BY metric, l_returnflag
"""


def null_safe_join_battery(spark, sf_dir):
    """Join semantics when keys contain NULLs — the classic silent-row-
    loss trap: ``=`` drops every null-keyed row from an inner join while
    ``<=>`` (eqNullSafe / IS NOT DISTINCT FROM) pairs them up, and a
    null-keyed null-safe join is a small cartesian of the null groups.
    Keys are derived deterministically (every 97th key goes null — null sets sized so the null-group cartesian stays bounded at bench scale)
    so the row-count gap is an exact, oracle-checkable fact rather than
    an anecdote. At scale the null-safe join also matters for PLANNING:
    Spark hashes <=> keys like ordinary keys (nulls co-locate on one
    partition — a skew source worth knowing about, see
    skew_key_report_lineitem)."""
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 97 == 0, None)
        .otherwise(F.col("o_orderkey") % 1000)
        .alias("k"),
        "o_orderkey",
    )
    c = _t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 97 == 0, None)
        .otherwise(F.col("c_custkey") % 1000)
        .alias("k"),
        "c_custkey",
    )
    eq = o.join(c, o.k == c.k).agg(
        F.lit("inner_eq").alias("join_kind"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ns = o.join(c, o.k.eqNullSafe(c.k)).agg(
        F.lit("inner_nullsafe").alias("join_kind"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return eq.unionByName(ns).orderBy("join_kind")


NULL_SAFE_JOIN_SQL = """
WITH o AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
              ELSE o_orderkey % 1000 END AS k FROM orders
), c AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
              ELSE c_custkey % 1000 END AS k FROM customer
)
SELECT 'inner_eq' AS join_kind, count(*) AS n_rows
FROM o JOIN c ON o.k = c.k
UNION ALL
SELECT 'inner_nullsafe', count(*)
FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
ORDER BY join_kind
"""


# =====================================================================
# k-anonymity audit with a generalization step
# =====================================================================

_KANON_K = 5


def k_anonymity_report(spark, sf_dir):
    """Privacy-engineering audit: k-anonymity of the customer table
    under two quasi-identifier generalization levels — the check a
    governance pipeline runs BEFORE a dataset leaves the boundary
    (pii_scan_docs handles direct identifiers; this handles
    re-identification by combination). Level "fine" keys on (nation,
    segment, balance-bucket-of-100); level "coarse" generalizes the
    balance away. Reports, per level: group count, the minimum group
    size (the dataset's k), and how many groups/rows sit below k=5 —
    the rows a release would have to suppress or generalize further.

    Scale: each level is ONE partial-aggregable groupBy on the QI tuple
    plus a tiny re-aggregate over group sizes; levels are independent
    scans (at 100 TB, compute all lattice levels wanted in one pass by
    cubing the generalization columns instead)."""
    c = _t(spark, sf_dir, "customer")
    levels = [
        (
            "1_fine",
            [
                F.col("c_nationkey"),
                F.col("c_mktsegment"),
                F.floor(F.col("c_acctbal") / 100).alias("bal_bucket"),
            ],
        ),
        ("2_coarse", [F.col("c_nationkey"), F.col("c_mktsegment")]),
    ]
    out = None
    for name, qi in levels:
        sizes = c.groupBy(*qi).agg(F.count(F.lit(1)).alias("gsize"))
        rep = sizes.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_groups"),
            F.min("gsize").alias("min_k"),
            F.count_if(F.col("gsize") < _KANON_K).alias("groups_below_k"),
            F.sum(F.when(F.col("gsize") < _KANON_K, F.col("gsize")).otherwise(0))
            .cast("long")
            .alias("rows_below_k"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out.orderBy("level")


K_ANONYMITY_SQL = f"""
WITH fine AS (
  SELECT count(*) AS gsize FROM customer
  GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 100)
), coarse AS (
  SELECT count(*) AS gsize FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT '1_fine' AS level, count(*) AS n_groups, min(gsize) AS min_k,
       count(*) FILTER (gsize < {_KANON_K}) AS groups_below_k,
       CAST(coalesce(sum(gsize) FILTER (gsize < {_KANON_K}), 0) AS BIGINT)
         AS rows_below_k
FROM fine
UNION ALL
SELECT '2_coarse', count(*), min(gsize),
       count(*) FILTER (gsize < {_KANON_K}),
       CAST(coalesce(sum(gsize) FILTER (gsize < {_KANON_K}), 0) AS BIGINT)
FROM coarse
ORDER BY level
"""


def timezone_rollup_battery(spark, sf_dir):
    """Local-time analytics: the same UTC event stream rolled up by
    LOCAL calendar day in two zones — America/New_York (whole-hour
    offset) and Asia/Kolkata (+05:30, the half-hour case that breaks
    naive hour-shift arithmetic). `from_utc_timestamp` is the Spark
    surface; the oracle is the double AT TIME ZONE hop. Every dashboard
    with a 'by day' axis does exactly this, and doing it wrong (fixed
    offset arithmetic instead of zone rules) shifts boundary events
    into the wrong day — here the two engines' INDEPENDENT tz databases
    must agree on every bucket for the hash to match.

    Scale: pure codegen projection + one partial-aggregable groupBy per
    zone over a bounded (zone × days) key domain."""
    e = _t(spark, sf_dir, "events").select("ts")
    out = None
    for zone in ("America/New_York", "Asia/Kolkata"):
        rolled = (
            e.select(
                F.lit(zone).alias("zone"),
                F.date_format(
                    F.from_utc_timestamp("ts", zone), "yyyy-MM-dd"
                ).alias("local_day"),
            )
            .groupBy("zone", "local_day")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        out = rolled if out is None else out.unionByName(rolled)
    return out.orderBy("zone", "local_day")


TIMEZONE_ROLLUP_SQL = """
WITH z AS (
  SELECT 'America/New_York' AS zone UNION ALL SELECT 'Asia/Kolkata'
)
SELECT z.zone,
       strftime(CAST(events.ts AT TIME ZONE 'UTC' AT TIME ZONE z.zone
                     AS DATE), '%Y-%m-%d') AS local_day,
       count(*) AS n_events
FROM events, z
GROUP BY 1, 2
ORDER BY zone, local_day
"""


def dst_boundary_audit(spark, sf_dir):
    """DST correctness proof: the event stream shifted +69 days
    straddles the 2024-03-10 US spring-forward; bucketing by
    America/New_York local hour across Mar 9-11 must show NO events in
    the 02:00 hour of Mar 10 — that local hour does not exist, and any
    fixed-offset shortcut (the -5h arithmetic that passes every other
    day of winter) would wrongly populate it. Both engines' tz rules
    must agree bucket-for-bucket, hash-checked. The per-hour counts are
    the audit a pipeline runs before trusting local-time partitioning
    near transitions.

    Scale: codegen projection + one bounded-key groupBy (3 days × ≤24
    hours); same shape as any local-time rollup."""
    e = _t(spark, sf_dir, "events").select(
        (F.col("ts") + F.expr("INTERVAL 69 DAYS")).alias("ts")
    )
    local = F.from_utc_timestamp("ts", "America/New_York")
    return (
        e.select(
            F.date_format(local, "yyyy-MM-dd").alias("local_day"),
            F.hour(local).alias("local_hour"),
        )
        .filter(F.col("local_day").between("2024-03-09", "2024-03-11"))
        .groupBy("local_day", "local_hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("local_day", "local_hour")
    )


DST_BOUNDARY_SQL = """
WITH local AS (
  SELECT (ts + INTERVAL 69 DAY) AT TIME ZONE 'UTC'
           AT TIME ZONE 'America/New_York' AS lts
  FROM events
)
SELECT strftime(CAST(lts AS DATE), '%Y-%m-%d') AS local_day,
       CAST(hour(lts) AS INTEGER) AS local_hour,
       count(*) AS n_events
FROM local
WHERE CAST(lts AS DATE) BETWEEN DATE '2024-03-09' AND DATE '2024-03-11'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def dst_fall_back_audit(spark, sf_dir):
    """The other DST hazard: on 2024-11-03 America/New_York repeats the
    01:00 hour (05:00Z AND 06:00Z both land in local hour 1), so
    local-hour partitioning silently merges two UTC hours of data —
    roughly double mass in that bucket. The stream shifted +307 days
    straddles the transition; per-(local day, hour) counts across Nov
    2-4 are hash-checked against the oracle's independent tz rules. The
    companion to dst_boundary_audit's missing hour: together they are
    why event-time pipelines partition on UTC and convert at the edge.
    """
    e = _t(spark, sf_dir, "events").select(
        (F.col("ts") + F.expr("INTERVAL 307 DAYS")).alias("ts")
    )
    local = F.from_utc_timestamp("ts", "America/New_York")
    return (
        e.select(
            F.date_format(local, "yyyy-MM-dd").alias("local_day"),
            F.hour(local).alias("local_hour"),
        )
        .filter(F.col("local_day").between("2024-11-02", "2024-11-04"))
        .groupBy("local_day", "local_hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("local_day", "local_hour")
    )


DST_FALL_BACK_SQL = """
WITH local AS (
  SELECT (ts + INTERVAL 307 DAY) AT TIME ZONE 'UTC'
           AT TIME ZONE 'America/New_York' AS lts
  FROM events
)
SELECT strftime(CAST(lts AS DATE), '%Y-%m-%d') AS local_day,
       CAST(hour(lts) AS INTEGER) AS local_hour,
       count(*) AS n_events
FROM local
WHERE CAST(lts AS DATE) BETWEEN DATE '2024-11-02' AND DATE '2024-11-04'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def l_diversity_histogram(spark, sf_dir):
    """k-anonymity's necessary companion: a group can be large (high k)
    yet reveal everyone's sensitive attribute if the group is
    homogeneous. Per quasi-identifier group (nation, balance-bucket of
    1000) count DISTINCT values of the sensitive attribute (market
    segment) = the group's l; histogram groups by l. Groups at l = 1
    are attribute-disclosure leaks a release must suppress no matter
    what k says.

    Scale: two chained partial-aggregable groupBys — (QI, sensitive)
    pairs first (this dedups the sensitive values map-side), then QI
    with a count = exact distinct-count per group WITHOUT
    count_distinct's expand; then a tiny histogram re-aggregate."""
    c = _t(spark, sf_dir, "customer")
    qi = [
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
    ]
    per_group_l = (
        c.select(*qi, "c_mktsegment")
        .distinct()
        .groupBy("nat", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("l"))
    )
    return (
        per_group_l.groupBy("l")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy("l")
    )


L_DIVERSITY_SQL = """
WITH per_group AS (
  SELECT c_nationkey, floor(c_acctbal / 1000) AS bal_bucket,
         count(DISTINCT c_mktsegment) AS l
  FROM customer
  GROUP BY 1, 2
)
SELECT l, count(*) AS n_groups
FROM per_group GROUP BY l ORDER BY l
"""


def t_closeness_report(spark, sf_dir):
    """Privacy-engineering audit #3 — t-closeness (Li et al., ICDE 2007),
    completing the k-anonymity / l-diversity trio: k bounds group size,
    l bounds sensitive-value VARIETY, t bounds how much a group's
    sensitive-value DISTRIBUTION deviates from the corpus-wide one (a
    group can be large and diverse yet still leak — e.g. one nation's
    customers all clustered in the lowest balance bracket).

    Distance is the ordinal Earth-Mover's Distance over 6 fixed balance
    brackets (floor(acctbal/2000), the full TPC-H domain):
    EMD = (1/(m-1)) * sum_k |cumQ_k - cumP_k|. Computed in EXACT integer
    arithmetic — |cumq*N - cump*n_g| summed, then one integer `div` into
    parts-per-million — so the report is bit-stable cross-engine. (At
    extreme corpus sizes cumq*N approaches int64 range: switch the
    accumulators to DECIMAL(38,0), same plan.)

    Scale shape: ONE groupBy on (QI, bracket) over the fact table; the
    6-row global distribution is a bounded-by-construction collect
    (bracket domain is fixed arithmetic) broadcast back as a literal
    map; per-group cumulatives run under a window PARTITIONED by the QI
    tuple (6 rows per partition — no global window anywhere); the dense
    bracket scaffold is an explode of a 6-element literal, not a join."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    bins = [-1, 0, 1, 2, 3, 4]
    m = len(bins)
    base = c.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("s"),
    )
    #: bounded collect: the bracket domain is fixed by arithmetic (6 rows)
    glob = {
        int(r["s"]): int(r["p"])
        for r in base.groupBy("s").agg(F.count(F.lit(1)).alias("p")).collect()
    }
    n_total = sum(glob.values())
    cump, acc = {}, 0
    for b in bins:
        acc += glob.get(b, 0)
        cump[b] = acc
    cump_lit = F.create_map(
        *[x for b in bins for x in (F.lit(b), F.lit(cump[b]))]
    )
    q = base.groupBy("nat", "seg", "s").agg(F.count(F.lit(1)).alias("q"))
    dense = (
        base.select("nat", "seg")
        .distinct()
        .select(
            "nat", "seg",
            F.explode(F.array(*[F.lit(b) for b in bins])).alias("s"),
        )
        .join(q, ["nat", "seg", "s"], "left")
        .withColumn("q", F.coalesce(F.col("q"), F.lit(0)))
    )
    w = Window.partitionBy("nat", "seg").orderBy("s")
    wg = Window.partitionBy("nat", "seg")
    terms = (
        dense.withColumn("cumq", F.sum("q").over(w))
        .withColumn("ng", F.sum("q").over(wg))
        .withColumn("cump", cump_lit[F.col("s")])
        .withColumn(
            "term",
            F.when(
                F.col("s") < bins[-1],
                F.abs(
                    F.col("cumq") * F.lit(n_total)
                    - F.col("cump") * F.col("ng")
                ),
            ).otherwise(F.lit(0)),
        )
    )
    return (
        terms.groupBy("nat", "seg")
        .agg(
            F.max("ng").alias("n_rows"),
            F.sum("term").alias("emd_num"),
        )
        .select(
            F.col("nat").alias("c_nationkey"),
            F.col("seg").alias("c_mktsegment"),
            "n_rows",
            "emd_num",
            F.expr(
                f"(1000000 * emd_num) div (n_rows * {n_total} * {m - 1})"
            ).alias("emd_ppm"),
        )
        .withColumn("t_violation", F.col("emd_ppm") > 200000)
        .orderBy("c_nationkey", "c_mktsegment")
    )


T_CLOSENESS_SQL = """
WITH base AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS s
  FROM customer
), bins AS (
  SELECT unnest(range(-1, 5)) AS s
), gdist AS (
  SELECT b.s, count(x.s) AS p
  FROM bins b LEFT JOIN base x ON x.s = b.s
  GROUP BY b.s
), gcum AS (
  SELECT s, sum(p) OVER (ORDER BY s) AS cump FROM gdist
), tot AS (
  SELECT count(*) AS n FROM base
), groups AS (
  SELECT DISTINCT nat, seg FROM base
), q AS (
  SELECT nat, seg, s, count(*) AS q FROM base GROUP BY 1, 2, 3
), dense AS (
  SELECT g.nat, g.seg, b.s, coalesce(q.q, 0) AS q
  FROM groups g CROSS JOIN bins b
  LEFT JOIN q ON q.nat = g.nat AND q.seg = g.seg AND q.s = b.s
), qcum AS (
  SELECT nat, seg, s,
         sum(q) OVER (PARTITION BY nat, seg ORDER BY s) AS cumq,
         sum(q) OVER (PARTITION BY nat, seg) AS ng
  FROM dense
)
SELECT qc.nat AS c_nationkey, qc.seg AS c_mktsegment,
       CAST(max(qc.ng) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN qc.s < 4
                     THEN abs(qc.cumq * t.n - gc.cump * qc.ng)
                     ELSE 0 END) AS BIGINT) AS emd_num,
       CAST((1000000 * sum(CASE WHEN qc.s < 4
                     THEN abs(qc.cumq * t.n - gc.cump * qc.ng)
                     ELSE 0 END)) // (max(qc.ng) * max(t.n) * 5)
            AS BIGINT) AS emd_ppm,
       CAST((1000000 * sum(CASE WHEN qc.s < 4
                     THEN abs(qc.cumq * t.n - gc.cump * qc.ng)
                     ELSE 0 END)) // (max(qc.ng) * max(t.n) * 5)
            AS BIGINT) > 200000 AS t_violation
FROM qcum qc JOIN gcum gc ON qc.s = gc.s CROSS JOIN tot t
GROUP BY 1, 2
ORDER BY c_nationkey, c_mktsegment
"""


REGISTRY_ADVANCED = {
    "t_closeness_report": QuerySpec(t_closeness_report, T_CLOSENESS_SQL),
    "streaming_heavy_hitters": QuerySpec(
        streaming_heavy_hitters, STREAMING_HH_SQL
    ),
    "exact_quantiles_two_pass": QuerySpec(
        exact_quantiles_two_pass, EXACT_QUANTILES_SQL
    ),
    "exact_grouped_quantiles": QuerySpec(
        exact_grouped_quantiles, EXACT_GROUPED_QUANTILES_SQL
    ),
    "bfs_customer_supplier_hops": QuerySpec(
        bfs_customer_supplier_hops, BFS_HOPS_SQL
    ),
    "streaming_late_data_drop": QuerySpec(
        streaming_late_data_drop, STREAMING_LATE_DROP_SQL
    ),
    "embedding_int8_quantization": QuerySpec(
        embedding_int8_quantization, EMBEDDING_INT8_SQL
    ),
    "metadata_only_stats": QuerySpec(metadata_only_stats, METADATA_ONLY_SQL),
    "runtime_bloom_join": QuerySpec(runtime_bloom_join, RUNTIME_BLOOM_SQL),
    "sql_table_function_cohort": QuerySpec(
        sql_table_function_cohort, SQL_TABLE_FUNCTION_SQL
    ),
    "cached_plan_reuse": QuerySpec(cached_plan_reuse, CACHED_REUSE_SQL),
    "null_safe_join_battery": QuerySpec(
        null_safe_join_battery, NULL_SAFE_JOIN_SQL
    ),
    "k_anonymity_report": QuerySpec(k_anonymity_report, K_ANONYMITY_SQL),
    "l_diversity_histogram": QuerySpec(
        l_diversity_histogram, L_DIVERSITY_SQL
    ),
    "timezone_rollup_battery": QuerySpec(
        timezone_rollup_battery, TIMEZONE_ROLLUP_SQL
    ),
    "dst_boundary_audit": QuerySpec(dst_boundary_audit, DST_BOUNDARY_SQL),
    "dst_fall_back_audit": QuerySpec(dst_fall_back_audit, DST_FALL_BACK_SQL),
}
