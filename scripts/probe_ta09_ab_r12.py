#!/usr/bin/env python
"""ta09 triage A/B (r12, VERDICT item #1): the r11 literal-merge chain
(argmax rows collected from the TakeOrdered job, applied as narrow literal
projections — 20 jobs) vs the r10 per-merge checkpoint chain (eager argmax
+ apply checkpoints per merge — 34 jobs), alternated warm in ONE session.
The old module is exec'd from git show b6f6edf with a stubbed @query
decorator so both implementations share the session.

Usage: [REPS=5] python scripts/probe_ta09_ab_r12.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from db_converter_spark.benchutil import drop_leaked_views, gc_drain, reset_cross_query_memos
from db_converter_spark.catalog import register_views
from db_converter_spark.session import build_session


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def load_old_textops():
    src = subprocess.check_output(
        ["git", "show", "b6f6edf:db_converter_spark/operators/textops.py"],
        cwd=str(Path(__file__).resolve().parent.parent),
        text=True,
    )
    mod = types.ModuleType("old_textops")
    mod.__dict__["__name__"] = "old_textops"
    # stub the registry decorator so re-registration doesn't clash
    import db_converter_spark.registry as reg

    real_query = reg.query
    reg.query = lambda *a, **k: (lambda fn: fn)
    try:
        exec(compile(src, "old_textops.py", "exec"), mod.__dict__)
    finally:
        reg.query = real_query
    return mod


def main() -> int:
    import db_converter_spark.operators.textops as new_t

    old_t = load_old_textops()
    reps = int(os.environ.get("REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ta09-ab-r12")
    register_views(spark, sf_dir)
    spark.range(0, 128).repartition(32).mapInPandas(lambda it: it, "id long").collect()

    def run(mod):
        reset_cross_query_memos(spark)
        return sorted(map(tuple, mod.ta09_bpe_train(spark, sf_dir).collect()))

    a = run(new_t); drop_leaked_views(spark)
    b = run(old_t); drop_leaked_views(spark)
    assert a == b, f"modes disagree: {a[:2]} vs {b[:2]}"
    print(f"modes agree ({len(a)} rows)")
    gc_drain(spark, pause=1.0)

    results = {"new": [], "old": []}
    for rep in range(reps):
        for tag, mod in (("new", new_t), ("old", old_t)):
            s0, t0 = steal(), time.perf_counter()
            run(mod)
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
            f"({len(calm)}/{len(vals)} calm) all={vals}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
