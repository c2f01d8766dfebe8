"""Round-8 operators — the properties the oracle compare can't see.

ta14: the encode must agree with an INDEPENDENT pure-Python BPE
(train + apply on the same corpus, same tie-break, same left-first
greedy merge) — both the per-source token totals and the round-trip
consistency with ta09's published merge table.
"""

from __future__ import annotations

import duckdb

from db_converter_spark.registry import all_queries
from tests.conftest import SF_DIR

_N_MERGES = 8


def _python_bpe(sf_dir: str):
    """Plain-Python BPE twin: word counts -> 8 trained merges -> encoded
    vocab, on the delimited-string representation (str.replace has the
    exact left-first non-overlapping semantics the SQL replace-all uses).
    Returns (merge_list, {word: n_subwords}, {(source, word): cnt})."""
    con = duckdb.connect()
    con.execute("SET threads=2")
    rows = con.execute(
        "SELECT source, w, COUNT(*) FROM (SELECT source, unnest(string_split(text, ' ')) AS w"
        f" FROM read_parquet('{sf_dir}/documents.parquet')) t WHERE w <> ''"
        " GROUP BY source, w"
    ).fetchall()
    swc = {(s, w): c for s, w, c in rows}
    wc: dict[str, int] = {}
    for (_, w), c in swc.items():
        wc[w] = wc.get(w, 0) + c
    from tests.bpe_twin import bpe_encode_vocab, bpe_train_merges

    return bpe_train_merges(wc, _N_MERGES), bpe_encode_vocab(wc, _N_MERGES), swc


def test_ta14_matches_python_bpe_twin(spark):
    merges, enc, swc = _python_bpe(SF_DIR)

    # the encode totals per source (and TOTAL) from the independent twin
    want: dict[str, list[int]] = {}
    for (src, w), c in swc.items():
        for key in (src, "TOTAL"):
            agg = want.setdefault(key, [0, 0, 0])
            agg[0] += c
            agg[1] += c * (len(w) + 1)
            agg[2] += c * enc[w]

    got = all_queries()["ta14_bpe_encode"].builder(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        n_words, char_toks, bpe_toks = want[r["source"]]
        assert r["n_words"] == n_words, r
        assert r["char_tokens"] == char_toks, r
        assert r["bpe_tokens"] == bpe_toks, r
        assert 0 < r["bpe_tokens"] < r["char_tokens"]  # merges actually fired
        saved = round(1000.0 * (char_toks - bpe_toks) / char_toks)
        assert r["saved_x1000"] == saved, r


def test_ta14_roundtrips_ta09_merge_table(spark):
    """encode(merges(corpus)) consistency: ta09's published merge table is
    exactly the twin's trained merges — so ta14's encode (which re-runs the
    same chain) serves the merges ta09 reports, closing the train→apply
    loop with an independent implementation on both sides."""
    merges, _, _ = _python_bpe(SF_DIR)
    ta09 = sorted(
        all_queries()["ta09_bpe_train"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["merge_idx"],
    )
    assert [(r["pa"], r["pb"]) for r in ta09] == merges
    assert [r["merged"] for r in ta09] == [a + b for a, b in merges]


# ---------------------------------------------------------------------------
# dq08 — per-column exactness + one-sided sketch estimate
# ---------------------------------------------------------------------------


def test_dq08_exact_matches_duckdb_quantile_disc_every_column(spark):
    rows = {
        (r["col"], r["qpct"]): r
        for r in all_queries()["dq08_column_quantiles"].builder(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.execute("SET threads=2")
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        want = con.execute(
            f"SELECT quantile_disc(CAST(ROUND({col}*100) AS BIGINT),"
            " [0.25, 0.5, 0.75, 0.9, 0.99])"
            f" FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        ).fetchone()[0]
        lo, hi = con.execute(
            f"SELECT MIN(CAST(ROUND({col}*100) AS BIGINT)),"
            f" MAX(CAST(ROUND({col}*100) AS BIGINT))"
            f" FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        ).fetchone()
        width = (hi - lo + 1) // 4096 + 1
        for q, exact in zip((25, 50, 75, 90, 99), want):
            r = rows[(col, q)]
            assert r["exact_cents"] == exact, (col, q, r, exact)
            # ceiling right edge: one-sided, within a bin width
            assert 0 <= r["err_cents"] <= width, (col, q, r)
