#!/usr/bin/env python
"""r6 dd14 scale probe: wall-time + assignment-stream row counts for the
two-level coarse→fine assignment at sf0.1 / sf1 / sf10, against the r5
flat assignment's n·k row count — the VERDICT's 'assignment rows grow
~n^1.5 not n²' acceptance check. Writes SCALE_PROBE_R6_DD14.json."""

from __future__ import annotations

import json
import math
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(ROOT))

from db_converter_spark.benchutil import drop_leaked_views, gc_drain
from db_converter_spark.catalog import register_views
from db_converter_spark.operators.dedup import _DD14_ASSIGN_SPARK
from db_converter_spark.registry import all_queries
from db_converter_spark.session import build_session

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", str(ROOT / ".scale" / "sf1")),
    ("sf10", str(ROOT / ".scale" / "sf10")),
]

# the REAL assignment SQL truncated after the sims CTE: exact level-2
# stream row count (the expensive cosine stream), plus the bounded stage
# cardinalities — measured on the same engine that runs the operator
_splits = _DD14_ASSIGN_SPARK.split("), pick AS (")
assert len(_splits) == 2, "dd14 assignment SQL shape drifted"
AUDIT_SQL = _splits[0] + ")\n" + """
SELECT
  (SELECT COUNT(*) FROM vecs)   AS n_vecs,
  (SELECT COUNT(*) FROM cents)  AS k_cents,
  (SELECT COUNT(*) FROM supers) AS n_supers,
  (SELECT COUNT(*) FROM sims)   AS lvl2_stream_rows
"""


def main() -> int:
    # optional argv scale filter + merge with a previous partial run, so
    # the three decades can run as separate invocations
    want = set(sys.argv[1:])
    scales = [(l, d) for l, d in SCALES if not want or l in want]
    path = ROOT / "SCALE_PROBE_R6_DD14.json"
    prev = json.loads(path.read_text())["scales"] if path.exists() else []
    prev = [r for r in prev if r["scale"] not in {l for l, _ in scales}]
    spark = build_session(app_name="dd14-probe-r6")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = {"probe": "dd14 two-level assignment, r6", "scales": list(prev)}

    def clean() -> None:
        # drop-views + drain between timed runs (benchutil — the r6 bench
        # q03 lesson; the first version of this probe measured 170.8 s at
        # sf10 where the clean harness measures ~14 s)
        drop_leaked_views(spark)
        gc_drain(spark)

    for label, d in scales:
        spark._dbc_registered_sf = None
        register_views(spark, d)
        t_best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs["dd14_semdedup"].builder(spark, d).collect()
            t = time.perf_counter() - t0
            t_best = t if t_best is None else min(t_best, t)
            clean()
        spark._dbc_registered_sf = None
        register_views(spark, d)
        n, k, sup, lvl2 = spark.sql(AUDIT_SQL).collect()[0]
        clean()
        rec = {
            "scale": label,
            "n_vecs": n,
            "k_cents": k,
            "n_supers": sup,
            "flat_assignment_rows_r5": n * k,
            # level-1 vec×super + centroid×super + exact level-2 stream
            "two_level_stream_rows_r6": n * sup + k * sup + lvl2,
            "lvl2_stream_rows_exact": lvl2,
            "wall_best_of_2_s": round(t_best, 2),
        }
        out["scales"].append(rec)
        print(rec, flush=True)
    out["scales"].sort(key=lambda r: r["n_vecs"])
    for a, b in zip(out["scales"], out["scales"][1:]):
        dn = math.log(b["n_vecs"] / a["n_vecs"])
        out.setdefault("growth_exponents", []).append(
            {
                "from": a["scale"],
                "to": b["scale"],
                "flat_rows_exponent": round(
                    math.log(b["flat_assignment_rows_r5"] / a["flat_assignment_rows_r5"]) / dn, 2
                ),
                "two_level_rows_exponent": round(
                    math.log(b["two_level_stream_rows_r6"] / a["two_level_stream_rows_r6"]) / dn, 2
                ),
                "wall_ratio": round(b["wall_best_of_2_s"] / a["wall_best_of_2_s"], 1),
            }
        )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out.get("growth_exponents"), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
