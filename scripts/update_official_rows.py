#!/usr/bin/env python
"""Maintain tests/official_rows.json — the name → (newest official green
round, source fingerprint) map behind the rotation-freshness guard
(tests/test_registry.py::test_tail_queries_unchanged_since_official_row).

Run this when queries get fresh official green rows:

    python scripts/update_official_rows.py --round 5 dd05_ngram_jaccard ...
    python scripts/update_official_rows.py --round 5 --head   # whole head

The guard then enforces, mechanically, what the r3/r4 verdicts checked by
hand with git diff: a query parked in the rotation tail may not have
changed since the round of its recorded official row.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from db_converter_spark.registry import _CHECK_TAIL, all_queries, query_fingerprint

MAP_PATH = Path(__file__).resolve().parent.parent / "tests" / "official_rows.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, dest="rnd")
    ap.add_argument("--head", action="store_true", help="update every head (non-tail) query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = all_queries()
    names = list(args.names)
    if args.head:
        names += [n for n in registry if n not in _CHECK_TAIL]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    rows = json.loads(MAP_PATH.read_text()) if MAP_PATH.exists() else {}
    for n in names:
        rows[n] = {"round": args.rnd, "fp": query_fingerprint(n)}
    MAP_PATH.write_text(json.dumps(dict(sorted(rows.items())), indent=1) + "\n")
    print(f"updated {len(names)} entries -> {MAP_PATH}")


if __name__ == "__main__":
    main()
