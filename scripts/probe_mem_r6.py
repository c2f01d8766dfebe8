#!/usr/bin/env python
"""r6 memory-pressure probe (VERDICT r5 Next #3): run the heavy operator
family at sf10 AND sf100 (~24 GB of probe tables) under a DELIBERATELY
small heap so shuffle spill actually happens, and record wall time,
spill bytes (from the Spark status REST API), result rows and join-node
counts per scale. The question the in-memory probes could not answer:
does anything flip, OOM, or degrade super-linearly once state stops
fitting in memory?

Usage: python scripts/probe_mem_r6.py [--heap 16g] [--scales sf10,sf100]
       [names ...]
Writes/merges SCALE_PROBE_R6_MEM.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(ROOT))

ap = argparse.ArgumentParser()
ap.add_argument("--heap", default="16g")
ap.add_argument("--scales", default="sf10,sf100")
ap.add_argument(
    "--out",
    default="SCALE_PROBE_R6_MEM.json",
    help="output artifact name (relative to repo root) — pass a new name"
    " for a re-probe so the prior round's evidence stays intact",
)
ap.add_argument("names", nargs="*")
args = ap.parse_args()

# MUST precede the Spark import chain: the driver heap and UI (the REST
# metrics source) are fixed at JVM launch
os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.heap
os.environ["SPARK_GRAFT_UI"] = "true"

from db_converter_spark.benchutil import drop_leaked_views, gc_drain  # noqa: E402
from db_converter_spark.registry import all_queries  # noqa: E402
from db_converter_spark.session import build_session  # noqa: E402

SCALE_DIRS = {
    "sf10": str(ROOT / ".scale" / "sf10"),
    "sf100": str(ROOT / ".scale" / "sf100"),
    # r11: the ta13 next-doubling probe — documents at 2000 reps (2x the
    # sf100 doc corpus; other tables are sf10-scale fillers for
    # register_views, ONLY document-scaled claims are valid at this label)
    "sf200": str(ROOT / ".scale" / "sf200"),
}

HEAVY = [
    "dd08_neardup_components",
    "dd10_lsh_jaccard_verify",
    "dd12_dup_substring_runs",
    "dd13_neardup_purge",
    "dd14_semdedup",
    "ta07_trigram_lm",
    "pipe05_corpus_build",
    "ss07_kmeans_train",
    "ev08_stream_stream_join",
]

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def _spill_totals() -> tuple[int, int]:
    app = _rest("applications")[0]["id"]
    mem = disk = 0
    for st in _rest(f"applications/{app}/stages?status=complete"):
        mem += st.get("memoryBytesSpilled", 0)
        disk += st.get("diskBytesSpilled", 0)
    return mem, disk


def main() -> int:
    spark = build_session(
        app_name="mem-probe-r6",
        extra_conf={
            # r11: ambient hypervisor CPU-steal storms (observed ~30k
            # steal ticks/min, ~5 cores stolen outright) starved the
            # local-mode driver's heartbeat threads 15 min into the sf100
            # leg; the HeartbeatReceiver expired the executor and shut the
            # SparkContext down mid-job. Probes run for hours with all 32
            # cores busy under DELIBERATE memory pressure — harden the
            # liveness timeouts so a noisy hypervisor cannot kill the
            # measurement (session-resilience conf, not a perf setting;
            # the benched engine session is untouched).
            "spark.network.timeout": "800s",
            "spark.executor.heartbeatInterval": "20s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = args.names or HEAVY
    scales = [s for s in args.scales.split(",") if s]
    path = ROOT / args.out
    out = json.loads(path.read_text()) if path.exists() else {
        "probe": "memory-pressure: heavy family under a small heap",
        "heap": args.heap,
        "cpus": spark.sparkContext.defaultParallelism,
        "results": {},
    }
    for name in names:
        rec = out["results"].setdefault(name, {})
        for label in scales:
            d = SCALE_DIRS[label]
            spark._dbc_registered_sf = None
            m0, d0 = _spill_totals()
            t0 = time.perf_counter()
            try:
                df = qs[name].builder(spark, d)
                # force EVERY column: a bare count() lets Catalyst
                # eliminate LEFT-JOIN tails wholesale (dd14's pair stage
                # vanished and the probe under-measured it 8x) — hash all
                # columns into one aggregated row instead
                from pyspark.sql import functions as F

                n_rows = (
                    df.select(F.xxhash64(*df.columns).alias("h"))
                    .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)"))
                    .collect()[0]["n"]
                )
                wall = time.perf_counter() - t0
                plan = df._jdf.queryExecution().executedPlan().toString()
                # post-action plans double-count via the AQE initial-plan
                # section — strip it before node counts
                plan = plan.split("== Initial Plan ==")[0]
                m1, d1 = _spill_totals()
                rec[label] = {
                    "wall_s": round(wall, 1),
                    "rows": n_rows,
                    "mem_spill_mb": round((m1 - m0) / 1e6),
                    "disk_spill_mb": round((d1 - d0) / 1e6),
                    "joins": {k: plan.count(k) for k in JOIN_NODES if plan.count(k)},
                    "oom": False,
                }
                if name.startswith("ta13"):
                    # which staged sub-passes exceeded the broadcast
                    # ceiling and paid the wide fallback (r11 reporting)
                    from db_converter_spark.operators.textops import (
                        TA13_LAST_RUN_FALLBACKS,
                    )

                    rec[label]["fallback_subpasses"] = [
                        list(t) for t in TA13_LAST_RUN_FALLBACKS
                    ]
            except Exception as e:  # record, don't die: OOM IS a finding
                rec[label] = {
                    "wall_s": round(time.perf_counter() - t0, 1),
                    "error": re.sub(r"\s+", " ", str(e))[:300],
                    "oom": "OutOfMemory" in str(e) or "Java heap space" in str(e),
                }
            print(name, label, rec[label], flush=True)
            # release leaked operator views + let the cleaner drain
            drop_leaked_views(spark)
            gc_drain(spark)
            path.write_text(json.dumps(out, indent=1) + "\n")  # persist per leg
        if rec.get("sf10", {}).get("wall_s") and rec.get("sf100", {}).get("wall_s"):
            rec["wall_ratio_100x_vs_10x"] = round(
                rec["sf100"]["wall_s"] / rec["sf10"]["wall_s"], 1
            )
            j10 = rec["sf10"].get("joins", {})
            j100 = rec["sf100"].get("joins", {})
            rec["plan_flips"] = sorted(
                k for k in set(j10) | set(j100) if j10.get(k, 0) != j100.get(k, 0)
            )
        path.write_text(json.dumps(out, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
