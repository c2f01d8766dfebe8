#!/usr/bin/env python
"""Generate a deterministic sf1-equivalent dataset (~10× sf0.1) into
``.scale/sf1/`` by unioning sf0.1 with key-offset replicas — the scale
probe input (r4 verdict Next #1: measure scaling, don't just argue it).

Replication rules (replica i ∈ 0..9; i=0 is the original rows verbatim):

- fact/dim keys offset consistently so every join still resolves:
  custkey/suppkey/partkey/user_id/doc_id/vec_id += i·1e6,
  orderkey/event_id += i·1e7; nationkey/regionkey untouched (real
  dimensions — their groups grow 10×, which is the point).
- document TEXT is vowel-translated with a distinct permutation per
  replica: length/token structure (and n_chars) are preserved, but every
  shingle/MinHash/fingerprint differs across replicas, so near-dup
  structure scales LINEARLY (each replica mirrors the original corpus's
  internal similarity) instead of creating 10-way duplicate cliques that
  would make pair-based operators legitimately superlinear.
- embeddings/events values are kept: more vectors per cell and more
  events per window = linear growth in the dimensions that matter.

Deterministic: pure SQL over the source parquet, no randomness.
Output is parquet with DuckDB's defaults (us timestamps — the catalog's
footer sniff handles either unit).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DST = Path(__file__).resolve().parent.parent / ".scale" / "sf1"
N_REP = 10

# 10 distinct vowel permutations (index 0 = identity); for replica counts
# beyond 10 a consonant rotation (i // 10) provides the second distinct
# knob, and beyond 100 a second consonant-set rotation (i // 100) a third
# — every replica's text transform is unique up to 1000 replicas (sf100),
# so cross-replica exact duplicates never form (k-way duplicate cliques
# would let exact-dedup reps collapse the corpus and understate scale).
VOWELS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeiuo", "eioau", "iouea", "ouaie", "uaeoi",
]
CONS = "bcdfghjklm"
CONS2 = "npqrstvwxz"


def _translate_expr(i: int) -> str:
    if i == 0:
        return "text"
    src_chars, dst_chars = "aeiou", VOWELS[i % 10]
    j = (i // 10) % 10
    if j:
        src_chars += CONS
        dst_chars += CONS[j:] + CONS[:j]
    k = i // 100
    if k:
        src_chars += CONS2
        dst_chars += CONS2[k:] + CONS2[:k]
    return f"translate(text, '{src_chars}', '{dst_chars}')"

M = 1_000_000
B = 10_000_000


def replica_select(table: str, i: int) -> str:
    src = f"read_parquet('{SRC}/{table}.parquet')"
    if table in ("region", "nation"):
        return f"SELECT * FROM {src}" if i == 0 else ""
    if table == "customer":
        return (
            f"SELECT c_custkey + {i * M} AS c_custkey, c_name, c_nationkey,"
            f" c_acctbal, c_mktsegment FROM {src}"
        )
    if table == "supplier":
        return (
            f"SELECT s_suppkey + {i * M} AS s_suppkey, s_name, s_nationkey,"
            f" s_acctbal FROM {src}"
        )
    if table == "part":
        return (
            f"SELECT p_partkey + {i * M} AS p_partkey, p_name, p_brand,"
            f" p_type, p_size, p_retailprice FROM {src}"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {i * B} AS o_orderkey,"
            f" o_custkey + {i * M} AS o_custkey, o_orderstatus, o_totalprice,"
            f" o_orderdate, o_orderpriority FROM {src}"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {i * B} AS l_orderkey,"
            f" l_partkey + {i * M} AS l_partkey,"
            f" l_suppkey + {i * M} AS l_suppkey, l_linenumber, l_quantity,"
            f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
            f" l_shipdate FROM {src}"
        )
    if table == "events":
        return (
            f"SELECT event_id + {i * B} AS event_id, ts,"
            f" user_id + {i * M} AS user_id, event_type, value, props"
            f" FROM {src}"
        )
    if table == "documents":
        tr = _translate_expr(i)
        return (
            f"SELECT doc_id + {i * M} AS doc_id, {tr} AS text, lang, source,"
            f" n_chars FROM {src}"
        )
    if table == "embeddings":
        return (
            f"SELECT vec_id + {i * M} AS vec_id, embedding, label FROM {src}"
        )
    raise ValueError(table)


def main() -> int:
    global N_REP
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10, help="replica count (10=sf1, 100=sf10, 1000=sf100)")
    ap.add_argument("--dst", default=str(DST))
    ap.add_argument(
        "--tables",
        default="",
        help="comma list to restrict generation (e.g. documents,embeddings,events"
        " for the sf100 memory-pressure probe — the heavy family's inputs)",
    )
    args = ap.parse_args()
    N_REP = args.reps
    dst = Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    only = {t for t in args.tables.split(",") if t}
    con = duckdb.connect()
    # a 1000-replica UNION ALL exceeds the default parser depth
    con.execute("SET max_expression_depth TO 10000")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        if only and t not in only:
            continue
        selects = [s for i in range(N_REP) if (s := replica_select(t, i))]
        union = " UNION ALL ".join(selects)
        out = dst / f"{t}.parquet"
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")
    con.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
