"""Local replica of the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and
order-insensitive values. Used by tests/test_correctness.py and by the dev
loop (python -m kinesis_app_spark.oracle [sf_dir] [query ...]).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from kinesis_app_spark.engine import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True, na_position="last")
    return out


def _values_equal(a, b) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    return a == b


def compare(name: str, spark_df, oracle_query: str, conn) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = conn.execute(oracle_query).df()
    res = CompareResult(name, True, len(spark_pdf), len(oracle_pdf))

    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        res.ok = False
        res.problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return res

    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(_py(x), _py(y))
        ]
        if bad:
            res.ok = False
            i, x, y = bad[0]
            res.problems.append(
                f"col {col}: {len(bad)}/{len(av)} values differ; first at sorted-row {i}: spark={x!r} oracle={y!r}"
            )
    return res


def _py(v):
    if v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if pd.api.types.is_scalar(v) and pd.isna(v):
        return None
    if hasattr(v, "item"):
        return v.item()
    return v


def run_all(sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from kinesis_app_spark import registry
    from kinesis_app_spark.engine import get_spark

    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    conn = duckdb_conn(sf_dir)
    results = []
    for name, spec in registry.REGISTRY.items():
        if names and name not in names:
            continue
        if spec.oracle is None:
            # rows-only check: query must run and produce a stable schema
            try:
                n = spec.fn(spark, sf_dir).count()
                results.append(CompareResult(name, True, n, -1, ["rows-only"]))
            except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
                results.append(CompareResult(name, False, -1, -1, [f"error: {e}"]))
            continue
        try:
            results.append(compare(name, spec.fn(spark, sf_dir), spec.oracle, conn))
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, -1, -1, [f"error: {e}"]))
    return results


if __name__ == "__main__":
    import sys

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    failed = 0
    for r in run_all(sf_dir, names):
        status = "OK  " if r.ok else "FAIL"
        print(f"{status} {r.name:38s} rows={r.spark_rows}")
        for p in r.problems:
            if p != "rows-only":
                print(f"     - {p}")
        failed += not r.ok
    print(f"\n{failed} failures")
    sys.exit(1 if failed else 0)
