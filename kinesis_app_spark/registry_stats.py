"""Registry: deterministic statistical analytics (OLS, correlation,
entropy, chi-square).

These are the aggregate statistics an analyst (or a data-quality monitor)
runs over event streams and fact tables. The engine discipline, as
everywhere in this repo: floating-point SUMS are never accumulated as
doubles (reassociation across partitions makes them run-dependent);
instead 2-decimal source values are scaled to exact longs, summed as
decimal(38,0) (overflow-proof, order-independent), and only the final
closed-form arithmetic happens in double — written with the identical
operation shape in the DuckDB oracle so results hash-match bit-for-bit.

Scale story: every query here is a single scan + one hash aggregate with
map-side partial aggregation (pairwise stats explode to a bounded number
of (pair) structs per row, chi-square to one cell key per row). State is
O(groups), never O(rows); nothing but the tiny aggregate result ever
crosses the network. These are the cheapest possible shapes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t

_DEC = "decimal(38,0)"


def _scaled(col, factor=100):
    """Exact integer view of a 2-decimal double column."""
    return F.round(F.col(col) * factor).cast("long")


def ols_regression_events(spark, sf_dir):
    """Per-event-type simple linear regression of value on hour-of-day
    (closed-form OLS): slope, intercept, and R². The five sufficient
    statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact integers —
    one partial-aggregable scan, no second pass, no driver math."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        _scaled("value").alias("y"),
    )
    s = base.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast(_DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(_DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(_DEC)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(_DEC)).cast("double").alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope / 100, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n") / 100, 6).alias(
            "intercept"
        ),
        F.round(cov_n * cov_n / (var_x * var_y), 6).alias("r2"),
    ).orderBy("event_type")


OLS_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(extract(hour FROM ts) AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS HUGEINT)) AS DOUBLE) AS syy
  FROM base GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round(((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 100, 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n / 100,
             6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
ORDER BY event_type
"""


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def corr_matrix_lineitem(spark, sf_dir):
    """Pairwise Pearson correlation among the lineitem measures — the
    6-pair upper triangle in ONE scan: each row explodes to 6 (cx, cy,
    x, y) structs (a bounded per-row constant), then a single hash
    aggregate on the pair key. Scaling factors cancel inside r, so the
    exact-integer view needs no rescale at the end."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    # ONE global aggregate computes every moment (4 sums + 4 square sums +
    # 6 cross sums + n = 15 agg columns) — no per-pair row explosion, the
    # scan's map side reduces 600k rows to a single partial per task; the
    # 6 output rows then unpivot from that one row (array explode of a
    # 1-row plan — free).
    sc = {c: _scaled(c) for c in _CORR_COLS}
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(sc[c].cast(_DEC)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((sc[c] * sc[c]).cast(_DEC)).cast("double").alias(f"ss_{c}")
        )
    for a, b in pairs:
        aggs.append(
            F.sum((sc[a] * sc[b]).cast(_DEC)).cast("double").alias(f"sp_{a}_{b}")
        )
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("cx"),
                F.lit(b).alias("cy"),
                F.col("n").alias("n"),
                F.col(f"s_{a}").alias("sx"),
                F.col(f"s_{b}").alias("sy"),
                F.col(f"sp_{a}_{b}").alias("sxy"),
                F.col(f"ss_{a}").alias("sxx"),
                F.col(f"ss_{b}").alias("syy"),
            )
            for a, b in pairs
        ]
    )
    s = one.select(F.explode(rows).alias("p")).select("p.*")
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "cx", "cy", F.col("n").cast("long").alias("n"), F.round(r, 6).alias("corr")
    ).orderBy("cx", "cy")


CORR_SQL = """
WITH ex AS (
  SELECT p.cx, p.cy, p.x, p.y
  FROM lineitem,
       UNNEST([
         {'cx': 'l_quantity', 'cy': 'l_extendedprice',
          'x': CAST(round(l_quantity * 100) AS BIGINT),
          'y': CAST(round(l_extendedprice * 100) AS BIGINT)},
         {'cx': 'l_quantity', 'cy': 'l_discount',
          'x': CAST(round(l_quantity * 100) AS BIGINT),
          'y': CAST(round(l_discount * 100) AS BIGINT)},
         {'cx': 'l_quantity', 'cy': 'l_tax',
          'x': CAST(round(l_quantity * 100) AS BIGINT),
          'y': CAST(round(l_tax * 100) AS BIGINT)},
         {'cx': 'l_extendedprice', 'cy': 'l_discount',
          'x': CAST(round(l_extendedprice * 100) AS BIGINT),
          'y': CAST(round(l_discount * 100) AS BIGINT)},
         {'cx': 'l_extendedprice', 'cy': 'l_tax',
          'x': CAST(round(l_extendedprice * 100) AS BIGINT),
          'y': CAST(round(l_tax * 100) AS BIGINT)},
         {'cx': 'l_discount', 'cy': 'l_tax',
          'x': CAST(round(l_discount * 100) AS BIGINT),
          'y': CAST(round(l_tax * 100) AS BIGINT)}
       ]) AS u(p)
), s AS (
  SELECT cx, cy,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS HUGEINT)) AS DOUBLE) AS syy
  FROM ex GROUP BY 1, 2
)
SELECT cx, cy, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr
FROM s
ORDER BY cx, cy
"""


def entropy_lang_by_source(spark, sf_dir):
    """Shannon entropy of the language distribution within each document
    source — the standard corpus-mix diagnostic (a source whose language
    entropy collapses is a crawl gone wrong). Probabilities are exact
    integer ratios; only the final p·ln p runs in double."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    totals = cells.groupBy("source").agg(F.sum("c").alias("n_docs"))
    p = F.col("c").cast("double") / F.col("n_docs").cast("double")
    # ln of an exact rational, quantized to 1e-6 per cell BEFORE the sum:
    # the cross-partition accumulation is then exact-integer, immune to
    # double reassociation (the one place engines legitimately diverge).
    term = F.round(p * F.log(p) * 1e6).cast("long")
    return (
        cells.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_langs"),
            F.round(-F.sum(term.cast(_DEC)).cast("double") / 1e6, 4).alias(
                "entropy"
            ),
        )
        .orderBy("source")
    )


ENTROPY_SQL = """
WITH cells AS (
  SELECT source, lang, count(*) AS c
  FROM documents GROUP BY 1, 2
), totals AS (
  SELECT source, sum(c) AS n_docs FROM cells GROUP BY 1
), terms AS (
  SELECT cells.source, totals.n_docs,
         CAST(round((CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE))
                    * 1e6) AS HUGEINT) AS term
  FROM cells JOIN totals USING (source)
)
SELECT source,
       CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       round(-CAST(sum(term) AS DOUBLE) / 1e6, 4) AS entropy
FROM terms
GROUP BY source
ORDER BY source
"""


def chi_square_events(spark, sf_dir):
    """Chi-square test of independence between event_type and day-of-week:
    contingency cells in one hash aggregate, expected counts from the
    integer marginals, χ² = Σ (obs − exp)²/exp in double (pure rational
    arithmetic — no transcendental functions, so bit-exact cross-engine).
    Day-of-week is pinned to Sunday=0 in both engines."""
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(F.count("*").alias("obs"))
    tot = cells.groupBy().agg(
        F.sum("obs").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    row_t = cells.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    col_t = cells.groupBy("dow").agg(F.sum("obs").alias("ct"))
    j = (
        cells.join(F.broadcast(row_t), "event_type")
        .join(F.broadcast(col_t), "dow")
        .crossJoin(F.broadcast(tot))
    )
    exp = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    term = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    return j.groupBy().agg(
        F.max(F.col("n")).cast("long").alias("n"),
        F.max((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round(F.sum(term), 4).alias("chi2"),
    )


CHI2_SQL = """
WITH cells AS (
  SELECT event_type, dayofweek(ts) AS dow, count(*) AS obs
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT sum(obs) AS n,
         count(DISTINCT event_type) AS r,
         count(DISTINCT dow) AS c
  FROM cells
), row_t AS (
  SELECT event_type, sum(obs) AS rt FROM cells GROUP BY 1
), col_t AS (
  SELECT dow, sum(obs) AS ct FROM cells GROUP BY 1
), terms AS (
  SELECT cells.obs,
         CAST(row_t.rt AS DOUBLE) * CAST(col_t.ct AS DOUBLE)
           / CAST(tot.n AS DOUBLE) AS exp,
         tot.n, tot.r, tot.c
  FROM cells
  JOIN row_t USING (event_type)
  JOIN col_t USING (dow)
  CROSS JOIN tot
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(max((r - 1) * (c - 1)) AS BIGINT) AS dof,
       round(sum((CAST(obs AS DOUBLE) - exp) * (CAST(obs AS DOUBLE) - exp)
                 / exp), 4) AS chi2
FROM terms
"""


def robust_zscore_events(spark, sf_dir):
    """Median/MAD robust outlier statistics per event type — the
    winsorize sibling that survives heavy tails (mean/stddev z-scores
    break on the very outliers they hunt). Two exact-percentile
    aggregates (median, then median absolute deviation) with the tiny
    per-type results broadcast back; outliers are |0.6745·(x−med)/MAD|
    > 3.5 (Iglewicz–Hoaglin). Exact interpolated percentiles over
    2-decimal values and rational double arithmetic — no accumulation
    surface, so cross-engine deterministic.

    Scale: two shuffles on event_type (bounded key space) + two
    broadcast joins; the scan never re-sorts globally."""
    e = _t(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    z = (
        with_med.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "med",
            "mad",
            (F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")) > 3.5).alias(
                "is_outlier"
            ),
        )
    )
    return z.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.max("med"), 4).alias("median"),
        F.round(F.max("mad"), 4).alias("mad"),
        F.count_if(F.col("is_outlier")).alias("n_outliers"),
    ).orderBy("event_type")


ROBUST_Z_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT e.event_type,
       count(*) AS n,
       round(max(m.med), 4) AS median,
       round(max(d.mad), 4) AS mad,
       count(*) FILTER (WHERE abs(0.6745 * (e.value - m.med) / d.mad) > 3.5)
         AS n_outliers
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def quantile_table_lineitem(spark, sf_dir):
    """Decile table for the lineitem measures — the lookup a feature
    scaler or drift monitor consumes (one row per measure × decile).
    Exact interpolated percentiles computed as ARRAYS in one aggregate
    (a single sort-based agg per measure, not nine), then unpivoted with
    posexplode. 2-decimal inputs make the interpolation midpoints exact
    doubles — deterministic cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    agg = li.agg(
        *[
            F.expr(
                f"percentile({c}, array({', '.join(str(q) for q in qs)}))"
            ).alias(c)
            for c in cols
        ]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("measure"), F.col(c).alias("qv"))
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.measure", F.posexplode("m.qv").alias("pos", "value"))
    return stacked.select(
        "measure",
        ((F.col("pos") + 1) * 10).cast("int").alias("pct"),
        F.round("value", 4).alias("value"),
    ).orderBy("measure", "pct")


QUANTILE_TABLE_SQL = """
WITH q AS (
  SELECT 'l_quantity' AS measure,
         quantile_cont(l_quantity, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qv
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice',
         quantile_cont(l_extendedprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
  FROM lineitem
  UNION ALL
  SELECT 'l_discount',
         quantile_cont(l_discount, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
  FROM lineitem
  UNION ALL
  SELECT 'l_tax',
         quantile_cont(l_tax, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
  FROM lineitem
)
SELECT measure,
       CAST(i * 10 AS INTEGER) AS pct,
       round(qv[i], 4) AS value
FROM q, UNNEST(generate_series(1, 9)) AS t(i)
ORDER BY measure, pct
"""


def autocorrelation_daily_events(spark, sf_dir):
    """Lag-k autocorrelation (k = 1, 7) of the daily event-count series —
    the seasonality probe run before fitting any forecast. The series is
    integer counts, so every sufficient statistic is exact; Pearson r over
    the lag-aligned pairs uses the same single-pass moment discipline as
    the OLS entry. Two tiny shuffles: the daily rollup (bounded by days),
    then a window lag + global moment aggregate per k."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window

    out = None
    for k in (1, 7):
        w = Window.orderBy("day")
        pairs = daily.select(
            "n", F.lag("n", k).over(w).alias("prev")
        ).filter(F.col("prev").isNotNull())
        s = pairs.agg(
            F.count("*").cast("double").alias("m"),
            F.sum(F.col("n").cast(_DEC)).cast("double").alias("sx"),
            F.sum(F.col("prev").cast(_DEC)).cast("double").alias("sy"),
            F.sum((F.col("n") * F.col("prev")).cast(_DEC)).cast("double").alias("sxy"),
            F.sum((F.col("n") * F.col("n")).cast(_DEC)).cast("double").alias("sxx"),
            F.sum((F.col("prev") * F.col("prev")).cast(_DEC)).cast("double").alias("syy"),
        )
        r = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.sqrt(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
        )
        row = s.select(
            F.lit(k).alias("lag"),
            F.col("m").cast("long").alias("n_pairs"),
            F.round(r, 6).alias("autocorr"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag")


AUTOCORR_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1
), lagged AS (
  SELECT k.k AS lag, n,
         lag(n, k.k) OVER (PARTITION BY k.k ORDER BY day) AS prev
  FROM daily, (VALUES (1), (7)) AS k(k)
), pairs AS (
  SELECT lag, n, prev FROM lagged WHERE prev IS NOT NULL
), s AS (
  SELECT lag,
         CAST(count(*) AS DOUBLE) AS m,
         CAST(sum(CAST(n AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(prev AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(n * prev AS HUGEINT)) AS DOUBLE) AS sxy,
         CAST(sum(CAST(n * n AS HUGEINT)) AS DOUBLE) AS sxx,
         CAST(sum(CAST(prev * prev AS HUGEINT)) AS DOUBLE) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag,
       CAST(m AS BIGINT) AS n_pairs,
       round((m * sxy - sx * sy)
             / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
         AS autocorr
FROM s
ORDER BY lag
"""


def seasonality_dow_index(spark, sf_dir):
    """Day-of-week seasonality index: each weekday's mean daily event
    count relative to the overall mean (index 1.0 = no seasonality) —
    the multiplicative-decomposition first step. All ratios of exact
    integer sums; day-of-week pinned Sunday=0 in both engines."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("n")
    )
    dows = daily.select((F.dayofweek("day") - 1).alias("dow"), "n")
    per_dow = dows.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("n").cast(_DEC)).cast("long").alias("events"),
    )
    tot = dows.agg(
        F.count("*").alias("t_days"),
        F.sum(F.col("n").cast(_DEC)).cast("long").alias("t_events"),
    )
    j = per_dow.crossJoin(F.broadcast(tot))
    mean_dow = F.col("events").cast("double") / F.col("n_days")
    mean_all = F.col("t_events").cast("double") / F.col("t_days")
    return j.select(
        "dow",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("events").alias("events"),
        F.round(mean_dow / mean_all, 6).alias("dow_index"),
    ).orderBy("dow")


SEASONALITY_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1
), dows AS (
  SELECT dayofweek(day) AS dow, n FROM daily
), per_dow AS (
  SELECT dow, count(*) AS n_days,
         CAST(sum(CAST(n AS HUGEINT)) AS BIGINT) AS events
  FROM dows GROUP BY 1
), tot AS (
  SELECT count(*) AS t_days,
         CAST(sum(CAST(n AS HUGEINT)) AS BIGINT) AS t_events
  FROM dows
)
SELECT CAST(dow AS INTEGER) AS dow,
       n_days, events,
       round((CAST(events AS DOUBLE) / n_days)
             / (CAST(t_events AS DOUBLE) / t_days), 6) AS dow_index
FROM per_dow CROSS JOIN tot
ORDER BY dow
"""


def skyline_orders(spark, sf_dir):
    """Pareto frontier (skyline): orders not dominated on (totalprice ↑,
    orderdate ↓ — "bigger and earlier wins"). The naive formulation is a
    quadratic NOT-EXISTS self-join (the oracle states it exactly that
    way); the engine rewrite is O(n log n): collapse to one row per
    distinct price, take an incremental running-min of dates over the
    price-desc group sequence (strictly-previous groups ⇔ strictly
    higher prices), and join the group minima back — no self-join, no
    per-row re-aggregated window frame. The classic
    declarative→algorithmic rewrite Catalyst cannot do for you.

    Dominance: a ≻ b iff price_a ≥ price_b AND date_a ≤ date_b with at
    least one strict; ties on both dims survive together. The global
    window is one total sort here; the 100 TB discipline is the standard
    skyline split — range-partition on price, per-partition skyline,
    then merge the (tiny) per-partition frontiers."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        # integer cents give an exact equality key for price groups
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    # dominated ⇔ (∃ strictly-higher-priced row with date ≤ mine)
    #           ∨ (∃ equal-priced row with date < mine)
    #
    # The strictly-higher min-date must NOT be a per-row moving-start
    # frame: Spark evaluates RANGE ... UNBOUNDED FOLLOWING frames by
    # recomputing the aggregate for every row — O(n²), a measured HANG at
    # 150k rows (caught by the sf0.1 bench, not the sf0.01 gate). Instead
    # collapse to one row per distinct price (groupBy pc), take the
    # running min over the price-desc GROUP sequence with an incremental
    # rows-frame (strictly-previous groups = strictly higher prices), and
    # join the two dates back — O(n log n) total.
    groups = (
        o.groupBy("pc").agg(F.min("o_orderdate").alias("eq_min"))
        .withColumn(
            "higher_min",
            F.min("eq_min").over(
                Window.orderBy(F.col("pc").desc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
    )
    j = o.join(groups, "pc")
    dominated = (
        (
            F.col("higher_min").isNotNull()
            & (F.col("higher_min") <= F.col("o_orderdate"))
        )
        | (F.col("eq_min") < F.col("o_orderdate"))
    )
    return (
        j.withColumn("dominated", dominated)
        .filter(~F.col("dominated"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    )


SKYLINE_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_totalprice >= a.o_totalprice
    AND b.o_orderdate <= a.o_orderdate
    AND (b.o_totalprice > a.o_totalprice OR b.o_orderdate < a.o_orderdate)
)
ORDER BY o_orderkey
"""


def revenue_concentration_by_segment(spark, sf_dir):
    """Revenue-concentration report per market segment: the Gini
    coefficient (rank formulation G = 2·Σ(iᵢ·xᵢ)/(n·Σx) − (n+1)/n over
    ascending-ranked per-customer revenue) and the top-20%-customers
    revenue share — the two numbers behind every "whales" conversation.
    Revenue is cents-exact; rank·revenue products accumulate as
    decimal(38,0); only the final closed form runs in double. Ties rank
    deterministically by custkey.

    Shape: orders roll up per customer (one shuffle), ranks ride one
    window per segment, and the final aggregate is O(segments)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast(_DEC))
            .cast("long")
            .alias("rev_cents")
        )
        .join(
            c.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("rev_cents").asc(), F.col("o_custkey").asc()
    )
    ranked = per_cust.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_cnt",
        F.count("*").over(
            Window.partitionBy("c_mktsegment")
        ),
    )
    seg = ranked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("rev_cents").cast(_DEC)).cast("double").alias("total"),
        F.sum((F.col("rk") * F.col("rev_cents")).cast(_DEC))
        .cast("double")
        .alias("rank_weighted"),
        F.sum(
            F.when(
                # top 20% by revenue = the highest-ranked fifth (ascending
                # ranks, so rk > 0.8n ⇔ strictly above the 80th position)
                F.col("rk") * 5 > F.col("n_cnt") * 4,
                F.col("rev_cents").cast(_DEC),
            )
        )
        .cast("double")
        .alias("top20_rev"),
    )
    return seg.select(
        "c_mktsegment",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.round(
            2.0 * F.col("rank_weighted") / (F.col("n_customers") * F.col("total"))
            - (F.col("n_customers") + 1.0) / F.col("n_customers"),
            6,
        ).alias("gini"),
        F.round(F.col("top20_rev") / F.col("total"), 6).alias("top20_share"),
    ).orderBy("c_mktsegment")


REVENUE_CONCENTRATION_SQL = """
WITH per_cust AS (
  SELECT o.o_custkey, c.c_mktsegment,
         CAST(sum(CAST(CAST(round(o.o_totalprice * 100) AS BIGINT) AS HUGEINT))
              AS BIGINT) AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, rev_cents,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev_cents ASC, o_custkey ASC) AS rk,
         count(*) OVER (PARTITION BY c_mktsegment) AS n_cnt
  FROM per_cust
), seg AS (
  SELECT c_mktsegment,
         count(*) AS n_customers,
         CAST(sum(CAST(rev_cents AS HUGEINT)) AS DOUBLE) AS total,
         CAST(sum(CAST(rk * rev_cents AS HUGEINT)) AS DOUBLE) AS rank_weighted,
         CAST(sum(CASE WHEN rk * 5 > n_cnt * 4
                       THEN CAST(rev_cents AS HUGEINT) END) AS DOUBLE)
           AS top20_rev
  FROM ranked GROUP BY 1
)
SELECT c_mktsegment,
       CAST(n_customers AS BIGINT) AS n_customers,
       round(2.0 * rank_weighted / (n_customers * total)
             - (n_customers + 1.0) / n_customers, 6) AS gini,
       round(top20_rev / total, 6) AS top20_share
FROM seg
ORDER BY c_mktsegment
"""


REGISTRY_STATS = {
    "revenue_concentration_by_segment": QuerySpec(
        revenue_concentration_by_segment, REVENUE_CONCENTRATION_SQL
    ),
    "skyline_orders": QuerySpec(skyline_orders, SKYLINE_SQL),
    "autocorrelation_daily_events": QuerySpec(
        autocorrelation_daily_events, AUTOCORR_SQL
    ),
    "seasonality_dow_index": QuerySpec(seasonality_dow_index, SEASONALITY_SQL),
    "quantile_table_lineitem": QuerySpec(
        quantile_table_lineitem, QUANTILE_TABLE_SQL
    ),
    "robust_zscore_events": QuerySpec(robust_zscore_events, ROBUST_Z_SQL),
    "ols_regression_events": QuerySpec(ols_regression_events, OLS_SQL),
    "corr_matrix_lineitem": QuerySpec(corr_matrix_lineitem, CORR_SQL),
    "entropy_lang_by_source": QuerySpec(entropy_lang_by_source, ENTROPY_SQL),
    "chi_square_events": QuerySpec(chi_square_events, CHI2_SQL),
}
