#!/usr/bin/env python
"""High-SF spot bench (round-9 verdict item 10): a compute-heavy entry
subset at fact-scale x10 (~sf1 facts), timed at the CURRENT
$SPARK_GRAFT_CPUS — run once at 32 and once at 8 and compare, restoring
the scale signal the sf0.1 suite has lost (its 8-core total ~= 32-core
total because per-query fixed overhead dominates there).

Reuses stress.py's x10 builder (cached under /tmp/kinesis_stress_x10)
and its best-of-N discipline. Prints ONE JSON line; the driver-style
wrapper plans/r09/run_spotbench.sh runs both core counts and writes
SPOTBENCH_r09.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

_REAL_STDOUT_FD = os.dup(1)
os.dup2(2, 1)

from kinesis_app_spark import registry  # noqa: E402
from kinesis_app_spark.engine import get_spark  # noqa: E402
import stress  # noqa: E402

ENTRIES = [
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "itemsim_cosine_parts",
    "itemsim_dimsum_parts",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "knn_brute_force",
    "embedding_covariance",
]


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPOTBENCH_REPS", "2"))
    spark = get_spark(
        app_name="r09-spotbench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    scaled = stress.build_scaled_dir(spark, 10)
    registry.REGISTRY["q1_pricing_summary"].fn(spark, scaled).write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in ENTRIES:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            registry.REGISTRY[name].fn(spark, scaled).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        print(f"SPOT c{cpus} {out[name]:8.2f}s {name}", file=sys.stderr)
    line = json.dumps(
        {"metric": "spotbench_x10", "cpus": int(cpus), "reps": reps,
         "queries": out, "total": round(sum(out.values()), 2)},
        separators=(",", ":"),
    )
    os.write(_REAL_STDOUT_FD, (line + "\n").encode())
    return 0


if __name__ == "__main__":
    sys.exit(main())
