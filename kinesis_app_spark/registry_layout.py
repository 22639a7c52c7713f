"""Registry: Hilbert-curve layout audit — the state-of-the-art
space-filling curve for multi-dimensional clustering (what lakehouse
"liquid"/advanced clustering uses instead of Z-order: Hilbert has no
long diagonal jumps, so consecutive curve positions are always adjacent
cells and per-file min/max spans come out tighter).

The xy→d Hilbert index is the classic iterative rotate-and-accumulate
algorithm: Spark evaluates it as a RUNTIME fold (``F.aggregate`` over
the bit-mask array with an (x, y, d) struct accumulator — plan size
O(1 step), no expression blowup), and the DuckDB oracle mirrors it as
10 stacked CTEs — every step exact bigint arithmetic, so the whole
audit hash-matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t

_BITS = 10  # 1024 x 1024 grid, like the z-order audit
_NBUCKETS = 100  # NOT a power of 4 — see hilbert_layout_audit
_KNUTH = 2654435761


def _hilbert_d(x, y):
    """Hilbert index of (x, y) on the 2^_BITS grid as a Column: the
    standard xy2d loop (rotate quadrant, accumulate s*s*((3*rx)^ry)) as
    a RUNTIME fold — ``F.aggregate`` over the bit sequence with a
    (x, y, d) struct accumulator.  Unrolling the loop into nested
    when-chains instead multiplies the expression tree ~5x per level
    (the CollapseProject blowup class this repo documents for MinHash);
    the fold keeps the plan one lambda deep while the loop iterates in
    the evaluator."""

    def step(acc, s):
        ax, ay, ad = acc["x"], acc["y"], acc["d"]
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = ad + (s * s * ((rx * 3).bitwiseXOR(ry)).cast("long"))
        fx = F.when(rx == 1, s - 1 - ax).otherwise(ax)
        fy = F.when(rx == 1, s - 1 - ay).otherwise(ay)
        return F.struct(
            F.when(ry == 0, fy).otherwise(ax).alias("x"),
            F.when(ry == 0, fx).otherwise(ay).alias("y"),
            nd.alias("d"),
        )

    init = F.struct(
        x.alias("x"), y.alias("y"), F.lit(0).cast("long").alias("d")
    )
    # fold over the s values (1<<9 .. 1<<0) directly — literal array
    svals = F.array(
        *[F.lit(1 << i).cast("long") for i in range(_BITS - 1, -1, -1)]
    )
    return F.aggregate(svals, init, step)["d"]


def hilbert_d_numpy(x, y, bits: int = _BITS):
    """Vectorized Hilbert xy→d over numpy int64 arrays — the BULK tier:
    the same rotate-and-accumulate loop runs 10 times over whole arrays
    (boolean-mask rotation), ~10 array ops per bit instead of an
    interpreted higher-order-function evaluation per row.  Asserted
    element-identical to the Column fold in tests."""
    import numpy as np

    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        rot = ry == 0
        flip = rot & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(rot, y_f, x), np.where(rot, x_f, y)
    return d


def hilbert_index_arrow(df, x_col: str, y_col: str, out_col: str = "hilbert_d"):
    """Attach the Hilbert index via a mapInArrow kernel — the tier a
    production OPTIMIZE/clustered-write job uses: zero-copy Arrow
    batches into the vectorized numpy loop, no pandas materialization,
    no per-row Python.  Output schema = input + out_col (long)."""
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        for batch in batches:
            x = batch.column(x_col).to_numpy(zero_copy_only=False)
            y = batch.column(y_col).to_numpy(zero_copy_only=False)
            d = hilbert_d_numpy(np.asarray(x), np.asarray(y))
            yield batch.append_column(out_col, pa.array(d, type=pa.int64()))

    from pyspark.sql import types as T

    # build a fresh StructType: df.schema returns the DataFrame's CACHED
    # StructType and .add() mutates it in place, which would corrupt the
    # input frame's own column list
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    return df.mapInArrow(kernel, out_schema)


def hilbert_layout_audit(spark, sf_dir):
    """Hilbert vs Morton head-to-head on the same scrambled
    (partkey, suppkey) grid as zorder_layout_audit: bucket each curve's
    index into 100 equal position ranges and compare per-bucket min/max
    spans — the
    file statistics a reader prunes on.  Hilbert's no-jump property
    should yield average spans at least as tight as Morton's on both
    dimensions, quantified here rather than asserted from folklore.

    Scale: both curve indexes are shuffle-free codegen arithmetic; the
    audit is two tiny hash aggregates. Range-partitioning production
    writes by hilbert_d is the same one Exchange a Z-order write costs."""
    from kinesis_app_spark.registry_analytics4 import _morton

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    x = (F.col("l_partkey").cast("long") * _KNUTH) % 1024
    y = (F.col("l_suppkey").cast("long") * _KNUTH) % 1024
    # 100 equal curve-position ranges — deliberately NOT a power of 4:
    # at power-of-4 granularity both curves tile identically (64x64
    # quadrants) and the comparison is vacuous; off-grid splits expose
    # Morton's diagonal jumps while Hilbert stays adjacent. The division
    # is by 2^20 so floor() is float-exact on both engines.
    # The index itself comes from the Arrow bulk kernel (vectorized
    # numpy loop); the Column fold _hilbert_d is the expression tier and
    # is asserted element-identical in tests.
    grid = li.select(x.alias("x"), y.alias("y"))
    hb = hilbert_index_arrow(grid, "x", "y").select(
        F.floor(F.col("hilbert_d") * _NBUCKETS / (1 << 20)).alias("bucket"),
        "x",
        "y",
    )
    mb = li.select(
        F.floor(_morton(x, y) * _NBUCKETS / (1 << 20)).alias("bucket"),
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

    return spans(hb, "hilbert").unionAll(spans(mb, "morton")).orderBy(
        "layout"
    )


def _hilbert_sql_ctes():
    """The same unrolled loop as 10 stacked CTEs rewriting (x, y, d);
    the ORIGINAL grid coords ride along as (ox, oy) for the span
    measurement."""
    ctes = []
    prev = "base"
    for step, i in enumerate(range(_BITS - 1, -1, -1)):
        s = 1 << i
        name = f"h{step}"
        ctes.append(f"""{name} AS (
  SELECT ox, oy,
         CASE WHEN ry = 0 THEN
             CASE WHEN rx = 1 THEN {s - 1} - y ELSE y END
         ELSE x END AS x,
         CASE WHEN ry = 0 THEN
             CASE WHEN rx = 1 THEN {s - 1} - x ELSE x END
         ELSE y END AS y,
         d + CAST({s} AS BIGINT) * {s} * xor(rx * 3, ry) AS d
  FROM (
    SELECT ox, oy, x, y, d,
           CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
           CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
    FROM {prev}
  )
)""")
        prev = name
    return ",\n".join(ctes), prev


_HILBERT_CTES, _HILBERT_LAST = _hilbert_sql_ctes()

from kinesis_app_spark.registry_analytics4 import _morton_sql  # noqa: E402

HILBERT_SQL = f"""
WITH base AS (
  SELECT (CAST(l_partkey AS BIGINT) * {_KNUTH}) % 1024 AS ox,
         (CAST(l_suppkey AS BIGINT) * {_KNUTH}) % 1024 AS oy,
         (CAST(l_partkey AS BIGINT) * {_KNUTH}) % 1024 AS x,
         (CAST(l_suppkey AS BIGINT) * {_KNUTH}) % 1024 AS y,
         CAST(0 AS BIGINT) AS d
  FROM lineitem
),
{_HILBERT_CTES},
hb AS (
  SELECT CAST(floor(d * {_NBUCKETS} / 1048576.0) AS BIGINT) AS bucket,
         ox AS x, oy AS y
  FROM {_HILBERT_LAST}
), grid AS (
  SELECT (CAST(l_partkey AS BIGINT) * {_KNUTH}) % 1024 AS x,
         (CAST(l_suppkey AS BIGINT) * {_KNUTH}) % 1024 AS y
  FROM lineitem
), hspans AS (
  SELECT bucket, max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
  FROM hb GROUP BY 1
), mb AS (
  SELECT CAST(floor(({_morton_sql('x', 'y')}) * {_NBUCKETS} / 1048576.0)
              AS BIGINT) AS bucket, x, y
  FROM grid
), mspans AS (
  SELECT bucket, max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
  FROM mb GROUP BY 1
)
SELECT 'hilbert' AS layout, count(*) AS n_buckets,
       CAST(round(avg(x_span), 4) AS DOUBLE) AS avg_x_span,
       CAST(round(avg(y_span), 4) AS DOUBLE) AS avg_y_span,
       max(x_span) AS max_x_span, max(y_span) AS max_y_span
FROM hspans
UNION ALL
SELECT 'morton', count(*),
       CAST(round(avg(x_span), 4) AS DOUBLE),
       CAST(round(avg(y_span), 4) AS DOUBLE),
       max(x_span), max(y_span)
FROM mspans
ORDER BY layout
"""


REGISTRY_LAYOUT = {
    "hilbert_layout_audit": QuerySpec(hilbert_layout_audit, HILBERT_SQL),
}
