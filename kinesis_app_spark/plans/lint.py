"""Physical-plan linting: the 100 TB anti-pattern checks as code.

Every scale claim in this repo reduces to assertions about the physical
plan — "this join broadcasts", "this never goes nested-loop", "the big
side never collapses onto one task". This module turns those claims into
inspectable data (``plan_summary``) and test assertions, and
tests/test_plan_audit.py runs the cartesian/nested-loop check across the
ENTIRE query registry, so a regression that flips a hash join into a
BroadcastNestedLoopJoin fails CI instead of surfacing as a 100x slowdown
at scale.

Plain-string parsing of ``executedPlan().toString()`` is deliberate: it
is the same surface ``df.explain()`` prints, stable across Spark 3/4,
and requires no py4j spelunking. AQE re-plans at runtime, but the
pre-execution plan is exactly what these checks care about — a cartesian
in the initial plan stays a cartesian under AQE.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanSummary:
    """Counts of the plan features the scale story cares about."""

    exchanges_hash: int = 0
    exchanges_range: int = 0
    exchanges_single: int = 0
    broadcast_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    python_eval_nodes: int = 0
    codegen_spans: int = 0
    parquet_scans: int = 0
    raw: str = field(default="", repr=False)

    @property
    def shuffles(self) -> int:
        return self.exchanges_hash + self.exchanges_range + self.exchanges_single


def plan_summary(df: DataFrame) -> PlanSummary:
    plan = physical_plan(df)
    return PlanSummary(
        exchanges_hash=len(re.findall(r"Exchange hashpartitioning", plan)),
        exchanges_range=len(re.findall(r"Exchange rangepartitioning", plan)),
        exchanges_single=len(re.findall(r"Exchange SinglePartition", plan)),
        broadcast_exchanges=len(re.findall(r"BroadcastExchange", plan)),
        broadcast_hash_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        nested_loop_joins=len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        cartesian_products=len(re.findall(r"CartesianProduct", plan)),
        python_eval_nodes=len(
            re.findall(
                r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
                r"AggregateInPandas|PythonMapInArrow|BatchEvalPython",
                plan,
            )
        ),
        codegen_spans=len(re.findall(r"WholeStageCodegen", plan)),
        parquet_scans=len(re.findall(r"FileScan parquet|Scan parquet", plan)),
        raw=plan,
    )


def assert_no_cartesian(df: DataFrame, what: str = "plan") -> PlanSummary:
    """Fail if the plan contains a cartesian product or a
    BroadcastNestedLoopJoin — the two shapes that are O(n*m) row visits
    and the classic silent scale-killers. Returns the summary so callers
    can chain further assertions."""
    s = plan_summary(df)
    if s.cartesian_products or s.nested_loop_joins:
        raise AssertionError(
            f"{what}: quadratic join in plan "
            f"(cartesian={s.cartesian_products}, "
            f"nested_loop={s.nested_loop_joins})\n{s.raw[:4000]}"
        )
    return s
