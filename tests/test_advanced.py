"""Unit tests for registry_advanced: BFS edge cases, exact-quantile edge
cases, and the streaming Misra-Gries state function's recall guarantee."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kinesis_app_spark.operators.graph import bfs_hops
from kinesis_app_spark.registry_advanced import (
    _SMG_CAPACITY,
    _mg_state_fn,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- BFS


def test_bfs_isolated_seed_stops_immediately(spark):
    """A seed with no incident edges yields exactly its hop-0 row and the
    frontier loop exits on the first empty expansion."""
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("z",)], "node string")
    out = bfs_hops(edges, seeds, max_hops=5).collect()
    assert [(r["node"], r["hop"]) for r in out] == [("z", 0)]


def test_bfs_chain_min_hop_and_bound(spark):
    """On a chain a-b-c-d-e, hops from {a} are the chain positions and
    max_hops truncates the frontier (min-hop semantics: b reached at 1
    stays 1 even though a-b-c-b walks exist)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {
        r["node"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=2).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 2}


def test_bfs_multi_seed_takes_closest(spark):
    """With seeds at both chain ends, every node's hop is the distance to
    the NEAREST seed."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    out = {
        r["node"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=3).collect()
    }
    assert out == {"a": 0, "d": 0, "b": 1, "c": 1}


# ------------------------------------------------- exact quantiles


def test_exact_quantiles_match_duckdb_formula(spark, tmp_path):
    """The histogram-probe must return the exact quantile_disc element on
    a constant column (degenerate width guard) and on a small distinct
    column (rank arithmetic)."""
    import duckdb

    from kinesis_app_spark import registry_advanced as adv

    # build a miniature sf dir with just lineitem(l_extendedprice)
    vals = [float(v) for v in range(1, 101)] + [50.0] * 17
    pdf = pd.DataFrame({"l_extendedprice": vals})
    d = tmp_path / "mini"
    d.mkdir()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(d / "lineitem.parquet")
    )
    got = {
        r["quantile"]: r["value"]
        for r in adv.exact_quantiles_two_pass(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    for q in adv._QUANTILES:
        want = con.execute(
            f"SELECT quantile_disc(l_extendedprice, {q}) FROM lineitem"
        ).fetchone()[0]
        assert got[q] == want, (q, got[q], want)


def test_exact_quantiles_constant_column(spark, tmp_path):
    """All-equal values: width degenerates to the 1.0 fallback and every
    quantile is that single value."""
    from kinesis_app_spark import registry_advanced as adv

    d = tmp_path / "const"
    d.mkdir()
    spark.createDataFrame(
        [(42.5,)] * 9, "l_extendedprice double"
    ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    out = adv.exact_quantiles_two_pass(spark, str(d)).collect()
    assert [r["value"] for r in out] == [42.5, 42.5, 42.5]


# --------------------------------------- streaming Misra-Gries state


class _FakeState:
    """Minimal stand-in for GroupState: exists/get/update."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _run_batches(batches):
    state = _FakeState()
    emitted = []
    for b in batches:
        for out in _mg_state_fn(("bucket0",), iter([b]), state):
            emitted.extend(out["token"].tolist())
    return state, set(emitted)


def test_mg_state_merges_across_batches_and_keeps_heavy_token():
    """A token above the 1/(capacity+1) share must survive across batch
    boundaries even when each batch floods the sketch with fresh noise
    tokens — the cross-batch state merge is what the streaming entry
    adds over the per-partition batch sketch."""
    heavy = ["hot"] * 600
    noise_a = [f"a{i}" for i in range(_SMG_CAPACITY * 2)]
    noise_b = [f"b{i}" for i in range(_SMG_CAPACITY * 2)]
    batches = [
        pd.DataFrame({"token": heavy[:300] + noise_a}),
        pd.DataFrame({"token": heavy[300:] + noise_b}),
    ]
    # total stream n = 600 + 800 = 1400; hot share 600/1400 >> 1/201
    state, emitted = _run_batches(batches)
    toks, cnts = state._v
    assert "hot" in toks
    # MG estimate only undercounts, by at most n/(capacity+1)
    est = dict(zip(toks, cnts))["hot"]
    assert 600 - 1400 / (_SMG_CAPACITY + 1) <= est <= 600
    assert "hot" in emitted


def test_mg_state_capacity_bound():
    """The sketch never holds more than capacity counters no matter how
    adversarial the vocabulary."""
    batches = [
        pd.DataFrame({"token": [f"t{i}_{j}" for i in range(500) for j in (0, 1)]})
        for _ in range(3)
    ]
    state, _ = _run_batches(batches)
    toks, cnts = state._v
    assert len(toks) <= _SMG_CAPACITY
    assert all(c > 0 for c in cnts)


def test_exact_grouped_quantiles_single_row_groups(spark, tmp_path):
    """A group with one row: its median is that row; mixed with a larger
    duplicate-heavy group (rank arithmetic over ties)."""
    import duckdb

    from kinesis_app_spark import registry_advanced as adv

    d = tmp_path / "grp"
    d.mkdir()
    rows = [("A", 7.0)] + [("B", v) for v in [1.0, 2.0, 2.0, 2.0, 9.0, 9.0]]
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    got = {
        r["l_returnflag"]: r["value"]
        for r in adv.exact_grouped_quantiles(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    want = dict(
        con.execute(
            "SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize(
    "name",
    ["metadata_only_stats", "runtime_bloom_join", "cached_plan_reuse"],
)
def test_conf_scoped_entries_leave_session_untouched(spark, name):
    """Entries that scope session confs (V2 source, bloom filter,
    broadcast threshold) or cache state must restore EVERYTHING before
    returning — a leaked conf would silently change every later query's
    plans, and a leaked cache pins executor memory."""
    from kinesis_app_spark import registry

    watched = [
        "spark.sql.parquet.aggregatePushdown",
        "spark.sql.sources.useV1SourceList",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    before = {k: spark.conf.get(k) for k in watched}
    registry.REGISTRY[name].fn(spark, SF_DIR).count()
    after = {k: spark.conf.get(k) for k in watched}
    assert before == after, f"{name} leaked session confs"


def test_cached_plan_reuse_releases_cache(spark):
    """After the entry returns, the CacheManager must hold no cached
    plans (.cache() registers there; localCheckpoint storage does not —
    it is freed by the ContextCleaner when the result DF is GC'd)."""
    from kinesis_app_spark import registry

    registry.REGISTRY["cached_plan_reuse"].fn(spark, SF_DIR).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_dst_spring_forward_hour_does_not_exist(spark):
    """2024-03-10 has no 02:00 hour in America/New_York; the audit's
    bucketing must leave it empty while surrounding hours have mass.
    Runs at sf0.01 — sf0.001's ~33 events/day leave ordinary hours
    empty too, which would make the absence assertion vacuous."""
    from kinesis_app_spark import registry

    rows = registry.REGISTRY["dst_boundary_audit"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    mar10 = {r["local_hour"] for r in rows if r["local_day"] == "2024-03-10"}
    assert 2 not in mar10
    assert {1, 3} <= mar10


def test_dst_fall_back_hour_has_double_mass(spark):
    """2024-11-03 repeats the 01:00 hour in America/New_York: two UTC
    hours of events merge into local hour 1, so its count must clearly
    exceed each single-UTC-hour neighbor (sf0.01 density)."""
    from kinesis_app_spark import registry

    rows = registry.REGISTRY["dst_fall_back_audit"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    mar = {
        r["local_hour"]: r["n_events"]
        for r in rows
        if r["local_day"] == "2024-11-03"
    }
    assert mar[1] > 1.4 * max(mar[0], mar[3])
