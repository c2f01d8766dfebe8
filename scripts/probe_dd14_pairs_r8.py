#!/usr/bin/env python
"""r8 probe (VERDICT r7 Next #5): demonstrate — not argue — that dd14's
pair stage SHARDS across executors at the sf100 decade.

BASELINE.md's r7 analysis attributed dd14's 14.9x memory-decade ratio to
the O(n^1.5) assignment on fixed cores and claimed the PAIR stage
"shards across executors at deployment". This probe isolates the pair
stage: the wide assignment is checkpointed ONCE (the expensive n^1.5 part,
off-clock for the pair timings), then the cid-keyed pair self-join runs at
several shard counts (spark.sql.shuffle.partitions with AQE coalescing
disabled so the shard count is honored exactly). If the stage genuinely
shards, wall divides by the shard count until the 32 local cores saturate,
and the per-cell pair work is balanced (max/avg cell size bounded by the
stride design, cells ~250 rows at any n).

Usage: python scripts/probe_dd14_pairs_r8.py [--heap 16g] [--scale sf100]
       [--shards 4,8,16,32]
Writes SCALE_PROBE_R8_DD14.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(ROOT))

ap = argparse.ArgumentParser()
ap.add_argument("--heap", default="16g")
ap.add_argument("--scale", default="sf100")
ap.add_argument("--shards", default="4,8,16,32")
ap.add_argument("--out", default="SCALE_PROBE_R8_DD14.json")
args = ap.parse_args()

os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.heap

from pyspark.sql import functions as F  # noqa: E402

from db_converter_spark.catalog import register_views  # noqa: E402
from db_converter_spark.operators.dedup import (  # noqa: E402
    _BIG_CKPT_LEVEL,
    _DD14_ASSIGN_SPARK,
    _DD14_PAIRS_SPARK,
)
from db_converter_spark.session import build_session  # noqa: E402


def main() -> int:
    spark = build_session(app_name="dd14-pairs-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = str(ROOT / ".scale" / args.scale)
    register_views(spark, sf_dir)

    t0 = time.perf_counter()
    assign = spark.sql(_DD14_ASSIGN_SPARK).localCheckpoint(
        eager=True, storageLevel=_BIG_CKPT_LEVEL
    )
    assign.createOrReplaceTempView("dd14_assign")
    assign_wall = round(time.perf_counter() - t0, 1)
    n_vec = assign.count()

    # cell-balance evidence: the stride design keeps cells ~250 rows at
    # any n, so no shard can be pinned by one giant cell
    cs = assign.groupBy("cid").count().agg(
        F.count("*").alias("k"),
        F.max("count").alias("max_cell"),
        F.avg("count").alias("avg_cell"),
    ).collect()[0]

    shard_walls = {}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        for s in [int(x) for x in args.shards.split(",")]:
            spark.conf.set("spark.sql.shuffle.partitions", str(s))
            t = time.perf_counter()
            df = spark.sql(_DD14_PAIRS_SPARK)
            row = df.select(F.xxhash64(*df.columns).alias("h")).agg(
                F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)")
            ).collect()[0]
            shard_walls[s] = {
                "wall_s": round(time.perf_counter() - t, 1),
                "pairs": row["n"],
            }
            print(f"shards={s}: {shard_walls[s]}", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce)

    out = {
        "probe": "dd14 pair stage sharding at the sf100 decade",
        "heap": args.heap,
        "cpus": spark.sparkContext.defaultParallelism,
        "scale": args.scale,
        "n_vectors": n_vec,
        "assign_wall_s": assign_wall,
        "cells": {
            "k": cs["k"],
            "max_cell": cs["max_cell"],
            "avg_cell": round(float(cs["avg_cell"]), 1),
        },
        "pair_stage_by_shards": shard_walls,
    }
    (ROOT / args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
