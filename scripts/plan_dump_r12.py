#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/r12/<name>_<tag>.txt.

Usage: python scripts/plan_dump_r12.py <before|after> name [name ...]

Runs each builder at sf0.01 (cheap; executes any intermediate checkpoints the
builder materializes) and writes the FINAL statement's formatted plan plus a
one-line Exchange/job summary. These files are the optimization round's
plan-claim evidence (OPTIMIZATION_r12.md references them).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from db_converter_spark.benchutil import drop_leaked_views
from db_converter_spark.registry import all_queries
from db_converter_spark.session import build_session


def formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name=f"plan-dump-{tag}")
    sf = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    qs = all_queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-dump {name}")
        df = qs[name].builder(spark, sf)
        plan = formatted_plan(spark, df)
        n_ex = sum(
            1
            for line in plan.splitlines()
            if line.strip().startswith("(") and "Exchange" in line.split(")", 1)[-1][:40]
        )
        (out_dir / f"{name}_{tag}.txt").write_text(
            f"== {name} [{tag}] final-statement plan (sf0.01) ==\n"
            f"== Exchange nodes in final statement: {n_ex} ==\n\n" + plan + "\n"
        )
        print(f"{name}: {n_ex} exchanges -> plans/r12/{name}_{tag}.txt")
        drop_leaked_views(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
