#!/usr/bin/env python
"""Per-query measurement harness for the r11 optimization round.

For each named query (default: the r11 target list), runs the builder +
collect() like bench.py does, and records wall seconds (best of N), the
number of Spark JOBS and STAGES the query launched (from the status
tracker), and the collect-row count. Job/stage counts are the structural
metric the optimizations target: at sf0.1 the corpus is KB-scale, so wall
is dominated by sequential job barriers, not data.

Usage: python scripts/profile_queries_r11.py [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from db_converter_spark.benchutil import (
    drop_leaked_views,
    gc_drain,
    reset_cross_query_memos,
)
from db_converter_spark.registry import all_queries
from db_converter_spark.session import build_session

DEFAULT = [
    "ta09_bpe_train", "ta14_bpe_encode", "pipe06_token_budget",
    "pipe11_context_fit", "pipe12_epoch_plan", "ss07_kmeans_train",
    "ss08_ivf_trained_topk", "ss11_pq_train", "ss12_pq_trained_topk",
    "dd08_neardup_components", "dd13_neardup_purge", "dd14_semdedup",
    "dd15_containment", "dq01_constraint_audit", "dq03_column_profile",
    "dq08_column_quantiles", "dd10_lsh_jaccard_verify", "dd16_lsh_calibration",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    spark = build_session(app_name="profile-r11")
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()

    # session warmups (mirror bench.py: codegen + python worker pool)
    qs["q01_pricing_summary"].builder(spark, sf_dir).collect()
    spark.range(0, spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").collect()
    drop_leaked_views(spark)

    out = {}
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        # one warm pass off-clock
        reset_cross_query_memos(spark)
        qs[name].builder(spark, sf_dir).collect()
        drop_leaked_views(spark)
        gc_drain(spark, pause=1.0)
        best, jobs, stages = None, None, None
        for _ in range(runs):
            reset_cross_query_memos(spark)
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            ids0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            qs[name].builder(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            ids1 = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = ids1 - ids0
            n_stages = 0
            for jid in new_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    n_stages += len(ji.stageIds)
            if best is None or dt < best:
                best, jobs, stages = dt, len(new_jobs), n_stages
            drop_leaked_views(spark)
        out[name] = {"best_s": round(best, 3), "jobs": jobs, "stages": stages}
        print(f"{name}: best {best:.3f}s jobs={jobs} stages={stages}")
        gc_drain(spark, pause=1.0)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
