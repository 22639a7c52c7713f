#!/usr/bin/env python
"""Benchmark harness: runs the full query registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the noop sink (full computation,
no driver collect — measures engine time, not result transfer).

Output discipline (the driver parses stdout): Spark's JVM inherits this
process's fd 1 and log4j's console appender writes to stdout, so we dup
the real stdout away at the OS level before the JVM starts and point fd 1
at stderr for the whole run. The final JSON line is written to the saved
real-stdout fd — guaranteed to be the ONLY stdout content — and also to
BENCH_RESULT.json next to this script.
"""

from __future__ import annotations

import json
import os
import sys
import time

# ---- stdout isolation: must happen before any Spark/JVM import ----------
_REAL_STDOUT_FD = os.dup(1)  # keep the driver-facing stdout
os.dup2(2, 1)  # everything the JVM / py4j / log4j prints on fd 1 -> stderr

from kinesis_app_spark import registry  # noqa: E402
from kinesis_app_spark.engine import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="kinesis-app-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session spin-up
    registry.q1_pricing_summary(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(name, spec) -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name, spec in registry.REGISTRY.items():
        try:
            timings[name] = run_once(name, spec)
            print(f"BENCH {timings[name]:8.2f}s {name}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — a failed query must not hide the rest
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {e}", file=sys.stderr)

    # Contention-spike mitigation: this box shows intermittent multi-
    # second interference (the same query measured 2 s and 18 s minutes
    # apart — see STRESS.md). Queries whose single-shot time exceeds a
    # spike threshold are re-timed once. BOTH timings are preserved in
    # the artifact (first_shot + retry) so the record is not selectively
    # optimistic: the headline totals are reported for each discipline —
    # `value` uses first-shot-only (no retry benefit anywhere), and
    # `value_min` uses min(first, retry) where a retry ran.
    first_shot = dict(timings)
    retries: dict[str, float] = {}
    ok = sorted(t for t in timings.values() if t >= 0)
    if ok:
        median = ok[len(ok) // 2]
        spike = max(3.0, 3 * median)
        for name, t in list(timings.items()):
            if t >= spike:
                try:
                    t2 = run_once(name, registry.REGISTRY[name])
                    retries[name] = t2
                    timings[name] = min(t, t2)
                    print(
                        f"BENCH RETRY {t:8.2f}s -> {t2:8.2f}s {name}",
                        file=sys.stderr,
                    )
                except Exception:  # noqa: BLE001 — keep the first timing
                    pass

    total_first = round(sum(t for t in first_shot.values() if t >= 0), 3)
    total_min = round(sum(t for t in timings.values() if t >= 0), 3)
    n_ok = sum(1 for t in timings.values() if t >= 0)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    summary = {
        "metric": "registry_total_runtime",
        # headline = first-shot total: every query timed exactly once,
        # no selective retry benefit (ADVICE r2: one-sided bias)
        "value": total_first,
        "unit": "sec",
        "sf": float(sf) if sf else sf_dir,
        # the registry GROWS every round (114 -> 285+ queries): totals are
        # not comparable across rounds, per-query mean is
        "n_queries": n_ok,
        "sec_per_query": round(total_first / max(n_ok, 1), 3),
        "value_min": total_min,
        "sec_per_query_min": round(total_min / max(n_ok, 1), 3),
        "n_retried": len(retries),
    }
    # full record (per-query first-shot + retry timings) for the judge
    full = dict(summary)
    full["queries_first_shot"] = first_shot
    full["queries_retry"] = retries
    result_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_RESULT.json")
    with open(result_path, "w") as fh:
        fh.write(json.dumps(full, separators=(",", ":")) + "\n")

    # the one and only stdout line, via the saved real-stdout fd — SHORT
    # (no per-query dict: the driver's tail capture is ~2000 chars and the
    # 285-entry dict overflowed it in r1/r2, leaving BENCH_r{N} unparsed)
    line = json.dumps(summary, separators=(",", ":"))
    os.write(_REAL_STDOUT_FD, (line + "\n").encode())
    return 1 if any(t < 0 for t in timings.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
