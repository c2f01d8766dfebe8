#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver records this per-round as BENCH_r{N}.json and compares against
BASELINE.md. Query set = every registered operator; per-query seconds are
the best of ``$SPARK_GRAFT_BENCH_RUNS`` (default 2) full collect() passes on
a warmed session — single-shot wall clock on a shared host swings 5-7x with
ambient load, and best-of-N recovers the machine's actual capability.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from db_converter_spark.registry import all_queries
from db_converter_spark.session import build_session


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="dbc-spark-bench")

    queries = all_queries()
    # Warm the JVM/codegen path so q01 doesn't pay session-boot cost.
    queries["q01_pricing_summary"].builder(spark, sf_dir).collect()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name in sorted(queries):
        best = float("inf")
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            queries[name].builder(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
