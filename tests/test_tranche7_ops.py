"""pipe13 structural invariants — the properties the oracle compare can't
see: hand-computable fixed-point DSIR arithmetic on a known corpus, both
engines agreeing on injected (non-parquet) rows, and the selection
actually enriching the target domain on real data."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _restore_views(spark):
    """Tests here synthesize tiny temp views over real table names;
    restore the real ones THROUGH the memo (register_views memoizes on
    the session)."""
    yield
    from db_converter_spark.catalog import register_views

    spark._dbc_registered_sf = None
    register_views(spark, SF_DIR)


def _bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 256


def _expected_scores(docs):
    """Python twin of pipe13's fixed-point arithmetic: per-bucket
    add-1-smoothed linear ratio, count-weighted per-doc mean."""
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    feats = []
    for doc_id, lang, words in docs:
        counts: dict[int, int] = {}
        for w in words:
            counts[_bucket(w)] = counts.get(_bucket(w), 0) + 1
        feats.append((doc_id, lang, counts))
        for b, c in counts.items():
            cr[b] = cr.get(b, 0) + c
            if lang == "en":
                ct[b] = ct.get(b, 0) + c
    out = {}
    for doc_id, lang, counts in feats:
        raw = sum(
            c * (((ct.get(b, 0) + 1) * (1 << 20)) // (cr[b] + 1))
            for b, c in counts.items()
        )
        n_tok = sum(counts.values())
        out[doc_id] = (lang, n_tok, raw // n_tok)
    return out


_DOCS = [
    (1, "en", ["alpha", "alpha", "beta"]),
    (2, "de", ["alpha", "gamma"]),
    (3, "de", ["gamma", "gamma", "gamma"]),
]


def _spark_pipe13(spark):
    from db_converter_spark.operators.pipeline import (
        _PIPE13_FEAT_SPARK,
        _pipe13_main,
    )

    feat = spark.sql(_PIPE13_FEAT_SPARK).localCheckpoint(eager=True)
    feat.createOrReplaceTempView("pipe13_feat_t")
    return spark.sql(_pipe13_main("pipe13_feat_t", "DIV", ""))


def test_pipe13_known_fixed_point_arithmetic(spark):
    """Three hand-built docs with collision-free word buckets: every
    per-bucket ratio and per-doc score recomputes exactly in Python, the
    English doc ranks first, and ordering is (score DESC, doc_id)."""
    words = {w for _, _, ws in _DOCS for w in ws}
    assert len({_bucket(w) for w in words}) == len(words), "bucket collision"
    spark.createDataFrame(
        [(i, " ".join(ws), lang, "s", 1) for i, lang, ws in _DOCS],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).createOrReplaceTempView("documents")
    rows = _spark_pipe13(spark).collect()
    expected = _expected_scores(_DOCS)
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["dsir_score_x1m"]) for r in rows}
    assert got == expected, (got, expected)
    # the target-domain doc ranks first; order is score-desc
    assert [r["doc_id"] for r in rows] == sorted(
        expected, key=lambda d: (-expected[d][2], d)
    )
    assert rows[0]["lang"] == "en"


def test_pipe13_both_engines_on_synthetic_corpus(spark):
    """The dq06/ss11 pattern: run the DuckDB oracle on the SAME injected
    rows as the Spark structural test (including a doc whose every word
    is unseen in the target) and assert identical rows — pins the md5
    bucketing, smoothing and DIV/// floor agreement off the driver's
    parquet fixtures."""
    import duckdb

    from db_converter_spark.operators.pipeline import _PIPE13_DUCK

    docs = _DOCS + [(4, "zh", ["delta", "delta"])]
    spark.createDataFrame(
        [(i, " ".join(ws), lang, "s", 1) for i, lang, ws in docs],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).createOrReplaceTempView("documents")
    got = sorted(tuple(r) for r in _spark_pipe13(spark).collect())

    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{' '.join(ws)}', '{lang}', 's', 1)" for i, lang, ws in docs
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + values
        + ") t(doc_id, text, lang, source, n_chars)"
    )
    orows = sorted(tuple(r) for r in con.execute(_PIPE13_DUCK).fetchall())
    assert got == orows, (got, orows)


def test_pipe13_enriches_target_on_real_corpus(spark):
    """On the real corpus the count-weighted ratio must point the right
    way: English documents score higher on average than non-English ones
    (the selection exists to enrich the target domain)."""
    from db_converter_spark.registry import QUERIES

    rows = QUERIES["pipe13_importance_resample"].builder(spark, SF_DIR).collect()
    assert rows, "empty selection"
    scores = [r["dsir_score_x1m"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    en = [r["dsir_score_x1m"] for r in rows if r["lang"] == "en"]
    other = [r["dsir_score_x1m"] for r in rows if r["lang"] != "en"]
    assert en and other, "fixture should contain both target and non-target"
    assert sum(en) / len(en) > sum(other) / len(other)
