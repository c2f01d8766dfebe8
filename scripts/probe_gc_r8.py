#!/usr/bin/env python
"""r8 probe (VERDICT r7 Next #8): re-baseline the main session's GC choice
on this round's host/kernel.

r7 engineered around a host pathology (9:1 system:user CPU on a 90 GB G1
heap — first-touch page zeroing + G1 concurrent-thread futex churn) by
switching the bench session to a 24 GB pre-touched ParallelGC heap. The
r7 verdict asked r8 to verify the choice on a (possibly sane) host: run
the churn-sensitive shuffle-heavy set under BOTH sessions as fresh
processes and record best/median per query, so BASELINE.md can state
whether the 24 GB ParallelGC session is still right or was compensating
for a one-round kernel quirk.

Usage: python scripts/probe_gc_r8.py [--runs 3]
Writes SCALE_PROBE_R8_GC.json. Each session variant runs in its own
subprocess (GC/heap are fixed at JVM launch).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

QUERIES = ["dq05_fk_orphans", "dq04_reconciliation", "dd13_neardup_purge",
           "dd10_lsh_jaccard_verify", "q36_recursive_cte"]

VARIANTS = {
    "parallelgc_24g_pretouch": {
        "SPARK_GRAFT_DRIVER_MEM": "24g",
        "SPARK_GRAFT_DRIVER_JAVA_OPTS": "-XX:+UseParallelGC -XX:+AlwaysPreTouch",
    },
    "g1_90g": {
        "SPARK_GRAFT_DRIVER_MEM": "90g",
        "SPARK_GRAFT_DRIVER_JAVA_OPTS": "-XX:+UseG1GC",
    },
}

_CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from db_converter_spark.benchutil import drop_leaked_views, gc_drain
from db_converter_spark.registry import all_queries
from db_converter_spark.session import build_session

names, runs = json.loads(sys.argv[1]), int(sys.argv[2])
spark = build_session(app_name="gc-probe-r8")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
sf = "/root/testdata/sf0.1"
out = {}
for name in names:
    qs[name].builder(spark, sf).collect()  # warm (JIT + IO cache)
    drop_leaked_views(spark)
    walls = []
    for _ in range(runs):
        gc_drain(spark)
        t = time.perf_counter()
        qs[name].builder(spark, sf).collect()
        walls.append(round(time.perf_counter() - t, 2))
        drop_leaked_views(spark)
    out[name] = walls
print("GCPROBE:" + json.dumps(out))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for label, env in VARIANTS.items():
        child_env = dict(os.environ, **env)
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, json.dumps(QUERIES), str(args.runs)],
            cwd=ROOT, env=child_env, capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("GCPROBE:")]
        if not line:
            results[label] = {"error": (r.stdout + r.stderr)[-1500:]}
            print(f"{label}: FAILED", flush=True)
            continue
        results[label] = json.loads(line[0][len("GCPROBE:"):])
        print(f"{label}: {results[label]}", flush=True)

    out = {"probe": "GC/heap re-baseline on the r8 host (r7 Next #8)",
           "sf": 0.1, "runs": args.runs, "results": results}
    (ROOT / "SCALE_PROBE_R8_GC.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
