"""Scale-hardening operators (SURVEY.md §7.3 milestone 5).

These exist for the shapes that break at 100 TB even though stock Spark
handles them at test scale:

- ``salted_aggregate``: two-phase aggregation over a salted key for
  *pathologically* hot grouping keys. AQE's skew handling splits skewed
  JOIN partitions, but a groupBy whose key has a handful of distinct
  values (e.g. 3 return flags over 10^11 rows) still funnels each key's
  partials through one reducer; salting fans the partial aggregation out
  ``salt_buckets``-wide first. Decomposable aggregates only (sum/count/
  min/max + avg derived at the final phase).
- ``write_bucketed`` / bucketed tables: pre-shuffle data by join key at
  write time so repeated big-big joins are exchange-free (verified by
  plan inspection in tests/test_scale.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_app_spark.pinning import pin

#: (kind, source column expr) measures supported by salted_aggregate
SaltedMeasure = tuple[str, Column]


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, SaltedMeasure],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) finals.

    measures: out_name -> (kind, column) with kind in
    {"sum", "count", "min", "max", "avg"}. The result is semantically
    identical to ``df.groupBy(keys).agg(...)`` — asserted against the
    DuckDB oracle — only the shuffle fan-out differs.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")

    partial_aggs: list[Column] = []
    final_aggs: list[Column] = []
    for name, (kind, col) in measures.items():
        if kind == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{name}"))
            final_aggs.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "count":
            partial_aggs.append(F.count(col).alias(f"__p_{name}"))
            final_aggs.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "min":
            partial_aggs.append(F.min(col).alias(f"__p_{name}"))
            final_aggs.append(F.min(f"__p_{name}").alias(name))
        elif kind == "max":
            partial_aggs.append(F.max(col).alias(f"__p_{name}"))
            final_aggs.append(F.max(f"__p_{name}").alias(name))
        elif kind == "avg":
            partial_aggs.append(F.sum(col).alias(f"__ps_{name}"))
            partial_aggs.append(F.count(col).alias(f"__pc_{name}"))
            final_aggs.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        else:
            raise ValueError(f"non-decomposable measure kind {kind!r}")

    partial = df.groupBy(*keys, salt).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the skewed side's hot keys would overload single
    reducers: the skewed side gets a per-row salt, the other side is
    replicated salt_buckets times, and the join runs on (keys + salt) so
    one hot key spreads across salt_buckets reducers.

    Semantically identical to ``skewed.join(other, on, how)`` for the
    supported join types (asserted in tests/test_scale.py). Only
    skewed-side-preserving joins are supported: with ``right``/``full``
    every UNMATCHED other-side row exists once per salt replica and would
    be emitted salt_buckets times, so those types raise instead of
    returning duplicates. Costs a salt_buckets-fold replication of the
    other side — use when AQE's skew splitting isn't available (e.g. the
    skew is in a shuffle feeding a non-join operator) or the other side is
    small but above broadcast size. Prefer ``broadcast()`` when it fits and
    AQE skew-join otherwise; this is the explicit fallback.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not supported — the replicated "
            "non-skewed side would emit each unmatched row salt_buckets "
            f"times. Supported: {sorted(allowed)}."
        )
    keys = list(on)
    salted_l = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*keys, F.spark_partition_id()), F.lit(salt_buckets))
        .cast("int")
        .cast("string"),
    )
    replicated = other.withColumn(
        "__salt",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
                lambda i: i.cast("string"),
            )
        ),
    )
    out = salted_l.join(replicated, [*keys, "__salt"], how)
    return out.drop("__salt")


def _one_shl(shift: Column) -> Column:
    """``1L << shift`` with a *column* shift amount. The PySpark
    ``F.shiftleft`` wrapper only accepts a Python-int shift; the underlying
    SQL function takes an expression, reached via call_function."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), shift.cast("int")
    )


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over ``keys[key_col]`` as a ONE-ROW DataFrame
    with a single ``map<int, bigint>`` column ``__bloom`` (bit-word index →
    64-bit word of set bits).

    Pure built-in expressions end to end: explode ``num_hashes`` seeds per
    key, xxhash64 → bit position, groupBy word + bit_or of masks, final
    map_from_entries. The result is tiny (≤ num_bits/64 entries) no matter
    how many keys went in, so it broadcasts for free. This is the same
    shape Spark's own runtime bloom-filter join injects
    (spark.sql.optimizer.runtime.bloomFilter.*) — built explicitly here so
    the pruning is available as a composable operator, e.g. ahead of an
    aggregation or a sink, not only where the optimizer happens to place it.
    """
    pos = F.pmod(F.xxhash64(F.col("__k"), F.col("__seed")), F.lit(num_bits))
    words = (
        keys.select(
            F.col(key_col).alias("__k"),
            F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("__seed"),
        )
        .select(
            (pos / 64).cast("int").alias("__word"),
            _one_shl(pos % 64).alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__word", "__bits")))
        ).alias("__bloom")
    )


def bloom_might_contain(
    key: Column, bloom: Column, num_bits: int, num_hashes: int
) -> Column:
    """Membership test against a ``bloom_filter_build`` map — true iff every
    one of the key's ``num_hashes`` bits is set. All codegen-able built-ins
    (xxhash64/pmod/element_at/bitwise), so the test runs inside the scan's
    WholeStageCodegen right next to the pushed-down filters."""
    test = F.lit(True)
    for seed in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        word = (pos / 64).cast("int")
        mask = _one_shl(pos % 64)
        test = test & (
            F.coalesce(F.element_at(bloom, word), F.lit(0).cast("bigint"))
            .bitwiseAND(mask)
            != 0
        )
    return test


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    on: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact semi-join of ``fact`` against ``dim_keys[on]`` with a Bloom
    pre-filter: the fact side is first pruned by a broadcast Bloom filter
    (no shuffle, evaluated inside the scan stage), then the survivors go
    through a broadcast left_semi join that removes the false positives.

    Semantically identical to ``fact.join(dim_keys, on, "left_semi")`` —
    the Bloom filter only ever *keeps* true matches (no false negatives).
    At 100 TB the win is that the expensive side is reduced before any
    join machinery sees it: with an fpp around 1% the residual join's
    input is ~|matches|, not |fact|. When the dim side is too large to
    broadcast for the residual join, the same pre-filter still cuts the
    fact side's shuffle volume by the filter's selectivity.
    """
    bloom = bloom_filter_build(dim_keys.select(on), on, num_bits, num_hashes)
    pruned = (
        fact.join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col(on), F.col("__bloom"), num_bits, num_hashes))
        .drop("__bloom")
    )
    return pruned.join(F.broadcast(dim_keys.select(on).distinct()), on, "left_semi")


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) code of two non-negative ints in [0, 2^bits):
    interleaves their bits so 2-d-close rows get close codes. Pure
    shift/mask expression tree (literal shift amounts — codegen-able).

    Sorting/range-partitioning by this code clusters rows into 2-d tiles,
    so parquet min/max footer stats prune files for predicates on EITHER
    dimension — a linear sort only ever prunes its leading column. This is
    the data-layout optimization behind Delta/Iceberg OPTIMIZE ZORDER,
    expressed as a plain column so any writer can use it.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def minmax_scaled(col: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) given its min/max (pass them
    as broadcast-joined columns — computing them is one cheap agg)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (col - lo) / span
    return F.least(
        F.floor(frac * ((1 << bits) - 1)).cast("bigint"),
        F.lit((1 << bits) - 1),
    )


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write df as parquet laid out in Z-order on (x_col, y_col):
    min/max-scale both columns, compute the Morton code, range-partition
    into num_files and sort within each — every output file covers a
    compact 2-d tile, so footer min/max stats prune on either column.
    One extra pass for the bounds agg, one range shuffle; no Python."""
    bounds = df.agg(
        F.min(x_col).alias("__xlo"),
        F.max(x_col).alias("__xhi"),
        F.min(y_col).alias("__ylo"),
        F.max(y_col).alias("__yhi"),
    )
    z = zorder_value(
        minmax_scaled(F.col(x_col), F.col("__xlo"), F.col("__xhi"), bits),
        minmax_scaled(F.col(y_col), F.col("__ylo"), F.col("__yhi"), bits),
        bits,
    )
    (
        df.join(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__xlo", "__xhi", "__ylo", "__yhi", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist df bucketed (and optionally sorted) by the join key.

    Two tables bucketed the same way join with ZERO exchanges — the
    pre-shuffle happened at write time, amortized across every future
    join. The 100 TB pattern for repeatedly-joined fact tables.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    partitions: int = 32,
    id_name: str = "rid",
) -> DataFrame:
    """Dense 1-based global row numbers in ``order_cols`` order WITHOUT a
    single-partition window — row_number() OVER (ORDER BY ...) collapses
    the whole table onto one task, the canonical way to fall over at
    100 TB. Instead, the zipWithIndex discipline expressed in DataFrames:

      1. range-repartition on the order key (partition p holds keys below
         partition p+1 — a range exchange, fully parallel),
      2. per-partition local ranks via a window PARTITIONED BY the range
         partition id (parallel across partitions),
      3. per-partition row counts -> cumulative offsets (a window over
         `partitions` rows, trivially small) broadcast back,
      4. id = offset + local rank.

    The ranged layout is MATERIALIZED (localCheckpoint) before the two
    passes: RangePartitioner samples its boundaries per execution, so the
    offsets pass and the ranks pass would otherwise each run their own
    exchange and can land rows in different partitions — observed as
    duplicate/missing ids at sf0.01 when the exchange was not reused.
    Materializing pins one physical layout that both passes read; this is
    the same two-pass-over-pinned-partitions discipline as RDD
    zipWithIndex, and at 100 TB it is one extra write of the id'd
    columns — id assignment is typically a once-per-ingest job. (In a
    cluster, swap localCheckpoint for persist(DISK_ONLY) or a staging
    table.) The final ids depend only on the total order, not on where
    the sampled boundaries land. Cost: one range exchange + the pinned
    write + one hash exchange on the partition id (the window's
    clustering requirement) — all parallel; nothing lands on one task.
    ``order_cols`` must be a total order (unique); ties would make ranks
    nondeterministic.
    """
    from pyspark.sql import Window

    cols = list(order_cols)
    part = (
        df.repartitionByRange(partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin, eager=True)
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_rank = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.withColumn("_rk", F.row_number().over(w_rank))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(id_name, (F.col("_off") + F.col("_rk")).cast("long"))
        .drop("_pid", "_rk", "_off")
    )


def two_phase_group_topk(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    salt_buckets: int = 16,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-k per group without a single hot-group task: the plain
    row_number window sends EVERY row of a group to one task — a
    web-scale "domain = google.com" group is a straggler or an OOM.
    Two-phase instead:

      phase 1: window over (group, salt) — salt = id-hash mod
               ``salt_buckets`` — keeps top-k per salt bucket, in
               parallel, discarding all but k*salt_buckets rows/group;
      phase 2: window over (group) on the tiny survivor set.

    Exact for any k: every global top-k row is top-k within its salt
    bucket (rank can only improve when competitors are removed), so
    phase 1 never discards a winner — same argument as partial
    TakeOrderedAndProject. ``tiebreak_cols`` must make the order total
    or ranks are nondeterministic (same contract as any top-k here).
    """
    from pyspark.sql import Window

    parts = list(part_cols)
    ties = [F.col(c) for c in tiebreak_cols]
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        *ties,
    ]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (list(tiebreak_cols) or [order_col])]),
        F.lit(salt_buckets),
    )
    w1 = Window.partitionBy(*parts, "_salt").orderBy(*order)
    w2 = Window.partitionBy(*parts).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("_salt", "_rk1")
    )
