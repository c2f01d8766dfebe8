#!/usr/bin/env python
"""ss11 triage A/B (r12, VERDICT item #1): fused single-job Lloyd's
iterations (the r11 shape) vs the classic two-step checkpointed-assignment
loop (the r10 shape), alternated in ONE session so ambient load hits both
modes equally. Per-rep steal ticks are recorded so stormy reps can be
discounted. Honors SPARK_GRAFT_CPUS (run at 32 and 8 like the driver).

Usage: [REPS=5] [SPARK_GRAFT_CPUS=32] python scripts/probe_ss11_ab_r12.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from db_converter_spark.benchutil import drop_leaked_views, gc_drain
from db_converter_spark.catalog import register_views
from db_converter_spark.session import build_session


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> int:
    import db_converter_spark.operators.similarity as sim

    reps = int(os.environ.get("REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ss11-ab-r12")
    register_views(spark, sf_dir)
    spark.range(0, 128).repartition(32).mapInPandas(lambda it: it, "id long").collect()

    def unfused_km_train(vflat_view, prefix, n_iter, k16, extra=""):
        """The r10 two-step loop: assignment checkpointed EVERY iteration."""
        sqls = sim._km_sqls(extra)
        cent = spark.sql(sqls["cent0"].format(vflat=vflat_view, k16=k16)).localCheckpoint(eager=True)
        asg_ref = ""
        for t in range(n_iter):
            cent_view = f"{prefix}_cent{t}"
            cent.createOrReplaceTempView(cent_view)
            asg_ref = f"{prefix}_asg{t}"
            spark.sql(
                sqls["asg"].format(vflat=vflat_view, cent=cent_view)
            ).localCheckpoint(eager=True).createOrReplaceTempView(asg_ref)
            cent = spark.sql(
                sqls["cent_next"].format(vflat=vflat_view, cent=cent_view, asg=asg_ref)
            ).localCheckpoint(eager=True)
        final_view = f"{prefix}_cent{n_iter}"
        cent.createOrReplaceTempView(final_view)
        return final_view, asg_ref

    def run_fused():
        return sorted(map(tuple, sim.ss11_pq_train(spark, sf_dir).collect()))

    def run_unfused():
        pqflat = spark.sql(sim._SS11_PQFLAT_SPARK).localCheckpoint(
            eager=True, storageLevel=sim._BIG_CKPT_LEVEL
        )
        pqflat.createOrReplaceTempView("ss11_pqflat")
        cent_view, asg_view = unfused_km_train(
            "ss11_pqflat", "ss11", sim._PQT_T, sim._PQT_K * 16, extra="m"
        )
        return sorted(map(tuple, spark.sql(
            sim._KM_FINAL_SS11.format(cent=cent_view, asg=asg_view)
        ).collect()))

    # warm both paths off-clock and check equality
    rows_f = run_fused()
    drop_leaked_views(spark)
    rows_u = run_unfused()
    drop_leaked_views(spark)
    assert rows_f == rows_u, "modes disagree!"
    print(f"modes agree ({len(rows_f)} rows)")
    gc_drain(spark, pause=1.0)

    results = {"fused": [], "unfused": []}
    for rep in range(reps):
        for tag, fn in (("fused", run_fused), ("unfused", run_unfused)):
            s0, t0 = steal(), time.perf_counter()
            fn()
            dt, ds = time.perf_counter() - t0, steal() - s0
            results[tag].append((round(dt, 3), ds))
            print(f"rep{rep} {tag}: {dt:.3f}s steal={ds}")
            drop_leaked_views(spark)
            gc_drain(spark, pause=0.5)
    for tag, vals in results.items():
        calm = [t for t, s in vals if s < 200]
        print(
            f"{tag}: best {min(t for t, _ in vals):.3f} "
            f"calm-best {min(calm) if calm else float('nan'):.3f} "
            f"({len(calm)}/{len(vals)} calm reps) all={vals}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
