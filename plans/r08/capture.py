#!/usr/bin/env python
"""Round-8 measurement harness.

Usage:
    python plans/r08/capture.py explain <suffix> <query> [query...]
        -> writes plans/r08/<query>_<suffix>.txt  (explain formatted)
    python plans/r08/capture.py time <n_passes> <query> [query...]
        -> times each query with the noop sink, n_passes times, prints
           per-query timings (same methodology as bench.py run_once)

Session matches bench.py: local[$SPARK_GRAFT_CPUS or 32], shuffle
partitions = core count, $SPARK_GRAFT_SF_DIR or sf0.1.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kinesis_app_spark import registry  # noqa: E402
from kinesis_app_spark.engine import get_spark  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r08-capture",
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
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
