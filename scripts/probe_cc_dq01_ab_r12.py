#!/usr/bin/env python
"""dd08 / dd13 / dq01 triage A/B (r12, VERDICT item #1): the r11
restructures (lazy per-round CC checkpoints; combined single-job dq01
stats) vs the r10 shapes (eager checkpoint + separate checksum job per CC
round; three sequential stat checkpoints), alternated in ONE session so
ambient load hits both modes equally. Per-rep steal ticks recorded.

Usage: [REPS=4] [SPARK_GRAFT_CPUS=32] python scripts/probe_cc_dq01_ab_r12.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from db_converter_spark.benchutil import drop_leaked_views, gc_drain
from db_converter_spark.catalog import register_views
from db_converter_spark.session import build_session


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> int:
    import db_converter_spark.operators.dedup as dd
    import db_converter_spark.operators.quality as dq

    reps = int(os.environ.get("REPS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="cc-dq01-ab-r12")
    register_views(spark, sf_dir)
    spark.range(0, 128).repartition(32).mapInPandas(lambda it: it, "id long").collect()

    def eager_min_label_components(sym, max_rounds=50):
        """The r10 loop: eager checkpoint per round + separate checksum job."""
        labels = (
            sym.select(F.col("src").alias("doc_id"))
            .distinct()
            .withColumn("label", F.col("doc_id"))
            .localCheckpoint(eager=True)
        )
        checksum = lambda df: df.agg(  # noqa: E731
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        prev_sum = checksum(labels)
        for _ in range(max_rounds):
            prop = sym.join(
                labels.withColumnRenamed("doc_id", "src"), "src"
            ).select(F.col("dst").alias("doc_id"), "label")
            hop = labels.unionByName(prop).groupBy("doc_id").agg(F.min("label").alias("label"))
            ptr = hop.select(F.col("doc_id").alias("_pid"), F.col("label").alias("_plabel"))
            new = (
                hop.join(ptr, hop["label"] == ptr["_pid"])
                .select("doc_id", F.least("label", "_plabel").alias("label"))
                .localCheckpoint(eager=True)
            )
            new_sum = checksum(new)
            labels = new
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        return labels

    def dd08_shape(components_fn):
        edges = spark.sql(dd._dd08_bands_spark()).localCheckpoint(eager=True)
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).persist()
        labels = components_fn(sym)
        out = sorted(map(tuple, (
            labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_docs") >= 2)
            .select(F.col("label").alias("comp_id"), "n_docs")
        ).collect()))
        sym.unpersist()
        return out

    def dd13_new():
        return sorted(map(tuple, dd.dd13_neardup_purge(spark, sf_dir).collect()))

    def dd13_old():
        # the dd13 builder with the eager (r10) CC loop spliced in
        from pyspark.sql.window import Window

        dd._dd10_prepare(spark, sf_dir)
        edges = spark.sql(
            "WITH "
            + dd._dd10_jac_ctes("dd10_cand", "dd10_doc_sh", hints=True)
            + f"\nSELECT da AS src, db AS dst FROM jac WHERE j >= {dd._DD13_J}"
        ).localCheckpoint(eager=True)
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).persist()
        labels = eager_min_label_components(sym)
        sym.unpersist()
        docs = dd.load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
        repmap = docs.select(
            "doc_id", "source",
            F.min("doc_id").over(Window.partitionBy("text")).alias("rep"),
        )
        comp = labels.select(F.col("doc_id").alias("rep"), F.col("label").alias("comp_id"))
        j = repmap.join(F.broadcast(comp), "rep", "left")
        is_rep = F.col("doc_id") == F.col("rep")
        near_purged = is_rep & F.col("comp_id").isNotNull() & (F.col("comp_id") != F.col("rep"))
        kept = is_rep & (F.col("comp_id").isNull() | (F.col("comp_id") == F.col("rep")))
        return sorted(map(tuple, j.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(~is_rep, 1).otherwise(0)).cast("bigint").alias("n_exact_purged"),
            F.sum(F.when(near_purged, 1).otherwise(0)).cast("bigint").alias("n_neardup_purged"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(0)).cast("bigint").alias("kept_id_checksum"),
        ).collect()))

    def dq01_new():
        return sorted(map(tuple, dq.dq01_constraint_audit(spark, sf_dir).collect()))

    def dq01_old():
        for view, stmt in (("o", dq._DQ01_O), ("l", dq._DQ01_L), ("ri", dq._DQ01_RI)):
            spark.sql(stmt).localCheckpoint(eager=True).createOrReplaceTempView(
                f"dq01_{view}"
            )
        long_sql = dq._DQ01_LONG
        for view in ("o", "l", "ri"):
            long_sql = long_sql.replace(f"FROM {view}", f"FROM dq01_{view}")
        return sorted(map(tuple, spark.sql(long_sql).collect()))

    modes = {
        "dd08": {
            "new": lambda: sorted(map(tuple, dd.dd08_neardup_components(spark, sf_dir).collect())),
            "old": lambda: dd08_shape(eager_min_label_components),
        },
        "dd13": {"new": dd13_new, "old": dd13_old},
        "dq01": {"new": dq01_new, "old": dq01_old},
    }
    only = os.environ.get("ONLY", "").strip()
    if only:
        modes = {k: v for k, v in modes.items() if k in only.split(",")}

    for q, m in modes.items():
        a = m["new"](); drop_leaked_views(spark)
        b = m["old"](); drop_leaked_views(spark)
        assert a == b, f"{q}: modes disagree!"
        print(f"{q}: modes agree ({len(a)} rows)")
    gc_drain(spark, pause=1.0)

    for q, m in modes.items():
        results = {"new": [], "old": []}
        for rep in range(reps):
            for tag in ("new", "old"):
                s0, t0 = steal(), time.perf_counter()
                m[tag]()
                dt, ds = time.perf_counter() - t0, steal() - s0
                results[tag].append((round(dt, 3), ds))
                drop_leaked_views(spark)
                gc_drain(spark, pause=0.5)
        for tag, vals in results.items():
            calm = [t for t, s in vals if s < 200]
            print(
                f"{q} {tag}: best {min(t for t, _ in vals):.3f} "
                f"calm-best {min(calm) if calm else float('nan'):.3f} "
                f"({len(calm)}/{len(vals)} calm) all={vals}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
