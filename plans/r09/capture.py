#!/usr/bin/env python
"""Round-9 measurement harness.

Usage:
    python plans/r09/capture.py explain <suffix> <query> [query...]
        -> writes plans/r09/<query>_<suffix>.txt  (explain formatted)
    python plans/r09/capture.py time <n_passes> <query> [query...]
        -> times each query with the noop sink, n_passes times, prints
           per-query timings (same methodology as bench.py run_once)
    python plans/r09/capture.py profile <query> [query...]
        -> runs each query once with streaming-progress instrumentation:
           every StreamingQuery started during the run reports its
           per-batch durationMs breakdown (triggerExecution, addBatch,
           walCommit, stateCommit, queryPlanning, ...) on stderr.

Session matches bench.py: local[$SPARK_GRAFT_CPUS or 32], shuffle
partitions = core count, $SPARK_GRAFT_SF_DIR or sf0.1.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kinesis_app_spark import registry  # noqa: E402
from kinesis_app_spark.engine import get_spark  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def _install_stream_probe(spark) -> None:
    """Wrap DataStreamWriter.start so every streaming query run by a
    registry fn prints its per-batch progress breakdown when it ends."""
    from pyspark.sql.streaming.readwriter import DataStreamWriter
    from pyspark.sql.streaming.query import StreamingQuery

    orig_start = DataStreamWriter.start
    orig_await = StreamingQuery.awaitTermination

    def start(self, *a, **kw):
        t0 = time.perf_counter()
        q = orig_start(self, *a, **kw)
        q._probe_t0 = t0  # noqa: SLF001
        q._probe_started = time.perf_counter()  # noqa: SLF001
        return q

    def dump(q):
        try:
            prog = [json.loads(p.json) for p in q.recentProgress]
        except Exception:
            prog = []
        lines = []
        for p in prog:
            d = p.get("durationMs", {})
            lines.append(
                f"  batch {p.get('batchId')}: rows={p.get('numInputRows')} "
                + " ".join(f"{k}={v}" for k, v in sorted(d.items()))
            )
            for so in p.get("stateOperators", []):
                lines.append(
                    "    state op {}: commit={}ms updates={}ms "
                    "removals={}ms rows={} stores={} mem={}".format(
                        so.get("operatorName"),
                        so.get("commitTimeMs"),
                        so.get("allUpdatesTimeMs"),
                        so.get("allRemovalsTimeMs"),
                        so.get("numRowsTotal"),
                        so.get("numStateStoreInstances"),
                        so.get("memoryUsedBytes"),
                    )
                )
        start_lat = getattr(q, "_probe_started", 0) - getattr(
            q, "_probe_t0", 0
        )
        print(
            f"STREAMPROF query={q.name} start_call={start_lat * 1000:.0f}ms "
            f"batches={len(prog)}",
            file=sys.stderr,
        )
        for ln in lines:
            print("STREAMPROF" + ln, file=sys.stderr)

    def awaitTermination(self, timeout=None):  # noqa: N802
        t0 = time.perf_counter()
        r = orig_await(self, timeout)
        wall = time.perf_counter() - t0
        print(
            f"STREAMPROF await={wall * 1000:.0f}ms", file=sys.stderr
        )
        dump(self)
        return r

    DataStreamWriter.start = start
    StreamingQuery.awaitTermination = awaitTermination


def main() -> int:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r09-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "explain":
        suffix = sys.argv[2]
        names = sys.argv[3:]
        for name in names:
            spec = registry.REGISTRY[name]
            df = spec.fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
    elif mode == "time":
        n = int(sys.argv[2])
        names = sys.argv[3:]
        # warm
        registry.q1_pricing_summary(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        results: dict[str, list[float]] = {nm: [] for nm in names}
        for p in range(n):
            for nm in names:
                spec = registry.REGISTRY[nm]
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                results[nm].append(dt)
                print(f"TIME p{p + 1} {dt:8.3f}s {nm}", flush=True)
        for nm, ts in results.items():
            s = sorted(ts)
            print(
                f"SUMMARY {nm}: min={s[0]:.3f} med={s[len(s) // 2]:.3f} "
                f"all={[round(t, 3) for t in ts]}"
            )
    elif mode == "profile":
        names = sys.argv[2:]
        registry.q1_pricing_summary(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        _install_stream_probe(spark)
        for nm in names:
            spec = registry.REGISTRY[nm]
            print(f"PROFILE {nm} ...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            print(f"PROFILE {nm} total={dt:8.3f}s", file=sys.stderr)
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
