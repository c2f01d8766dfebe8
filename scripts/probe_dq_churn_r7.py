#!/usr/bin/env python
"""r7 churn repro (VERDICT r6 Next #1): run the alphabetical suite PREFIX
dc01..dq06 exactly as bench.py does (best-of-3, same drop-views + GC-drain
cadence) and print per-query best/median, to establish whether the r6
official artifact's dq04 (3.7 s best / 9.7 s median) and dq05 (10.1 s
best-of-3) were a *mechanism* (dd-block residue reaching the dq block) or
ambient host load during the round-close run.

Usage: python scripts/probe_dq_churn_r7.py [--runs 3] [--stop-after dq06]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from db_converter_spark.benchutil import drop_leaked_views as _dlv  # noqa: E402
from db_converter_spark.benchutil import gc_drain as _gcd  # noqa: E402
from db_converter_spark.registry import all_queries  # noqa: E402
from db_converter_spark.session import build_session  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--runs", type=int, default=3)
ap.add_argument("--stop-after", default="dq06")
ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
args = ap.parse_args()

spark = build_session(app_name="dbc-spark-churn-probe")
queries = all_queries()
queries["q01_pricing_summary"].builder(spark, args.sf_dir).collect()
spark.range(0, spark.sparkContext.defaultParallelism * 4).repartition(
    spark.sparkContext.defaultParallelism
).mapInPandas(lambda it: it, "id long").collect()

# same heavy set as bench.py (subset relevant to the prefix)
HEAVY = {
    "dd05_ngram_jaccard", "dd08_neardup_components", "dd10_lsh_jaccard_verify",
    "dd12_dup_substring_runs", "dd13_neardup_purge", "dd14_semdedup",
    "dc03_bloom_decontaminate", "dd15_containment", "dd16_lsh_calibration",
}


def drop_leaked_views() -> None:
    _dlv(spark)


def gc_drain() -> None:
    _gcd(spark)


since_gc = 0
for name in sorted(queries):
    prefix = name.split("_", 1)[0]
    if not (prefix.startswith("dc") or prefix.startswith("dd") or prefix.startswith("dq")):
        continue
    if since_gc >= 6:
        gc_drain()
        since_gc = 0
    samples = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        queries[name].builder(spark, args.sf_dir).collect()
        samples.append(round(time.perf_counter() - t0, 3))
    s = sorted(samples)
    print(f"{name}: best {s[0]:.3f} med {s[len(s)//2]:.3f} all {samples}", flush=True)
    drop_leaked_views()
    since_gc += 1
    if name in HEAVY:
        gc_drain()
        since_gc = 0
    if prefix == args.stop_after.split("_")[0] and name.startswith(args.stop_after):
        break
print("done", flush=True)
