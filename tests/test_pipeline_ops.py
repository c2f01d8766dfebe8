"""pipe03 / pipe04 / ta07 structural invariants — properties the
oracle compare can't see: determinism across re-runs and partitionings,
shard-position contiguity, and sampling-rate calibration."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_shard_positions_are_contiguous_and_total(spark):
    """Every document lands in exactly one (shard, pos); positions within a
    shard are a gapless 0..n-1 run — the property that lets a trainer mmap
    shard files by offset."""
    from db_converter_spark.operators.pipeline import pipe04_shard_assign

    rows = pipe04_shard_assign(spark, SF_DIR).collect()
    n_docs = len({r["doc_id"] for r in rows})
    assert n_docs == len(rows), "a doc_id appeared in two shards"
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), f"shard {shard} has position gaps"


def test_shard_assignment_deterministic_across_partitionings(spark):
    from db_converter_spark.operators.pipeline import pipe04_shard_assign

    a = {tuple(r) for r in pipe04_shard_assign(spark, SF_DIR).collect()}
    b = {
        tuple(r)
        for r in pipe04_shard_assign(spark, SF_DIR).repartition(3).collect()
    }
    assert a == b


def test_weighted_sample_is_calibrated(spark):
    """Kept fraction per source tracks its configured keep-rate: the
    multiplicative-hash coin must behave uniformly (binomial 3-sigma band),
    and re-running selects the identical subset (checksum equality)."""
    from db_converter_spark.operators.pipeline import (
        _MIX_WEIGHTS,
        pipe03_weighted_sample,
    )

    rows = {r["source"]: r for r in pipe03_weighted_sample(spark, SF_DIR).collect()}
    assert set(rows) == set(_MIX_WEIGHTS)
    for source, r in rows.items():
        p = _MIX_WEIGHTS[source] / 1000.0
        n = r["n_docs"]
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(r["n_kept"] - n * p) <= 3 * sigma + 1, (
            f"{source}: kept {r['n_kept']}/{n} vs rate {p}"
        )
    again = {r["source"]: r for r in pipe03_weighted_sample(spark, SF_DIR).collect()}
    assert {s: r["kept_id_checksum"] for s, r in rows.items()} == {
        s: r["kept_id_checksum"] for s, r in again.items()
    }


def test_trigram_counts_are_internally_consistent(spark):
    """Per doc: distinct <= total trigrams, total == max(len-2, 0) over the
    guard, hapax <= distinct, and a doc's average corpus frequency is at
    least 100 (every trigram occurs at least once corpus-wide)."""
    from db_converter_spark.catalog import load_table
    from db_converter_spark.operators.textops import ta07_trigram_lm

    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .selectExpr("doc_id", "length(text) AS n")
        .collect()
    }
    rows = ta07_trigram_lm(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_trigrams"] == lens[r["doc_id"]] - 2
        assert 1 <= r["n_distinct_trigrams"] <= r["n_trigrams"]
        assert 0 <= r["n_hapax_trigrams"] <= r["n_distinct_trigrams"]
        assert r["avg_corpus_freq_x100"] >= 100
    short = [d for d, n in lens.items() if n < 3]
    assert {r["doc_id"] for r in rows} == set(lens) - set(short)


def test_corpus_build_survives_degenerate_documents(spark):
    """ANSI mode turns an unguarded division into DIVIDE_BY_ZERO: empty and
    whitespace-only documents (zero tokens / zero alpha chars) must flow
    through the quality gate as not-quality rows, never crash the plan."""
    from db_converter_spark.operators.pipeline import _PIPE05_SPARK

    spark.createDataFrame(
        [
            (1, "", "en", "src0", 0),
            (2, "   ", "en", "src1", 3),
            (3, "a b c d e f g h i j", None, "src2", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).createOrReplaceTempView("documents")
    try:
        rows = {r["source"]: r for r in spark.sql(_PIPE05_SPARK).collect()}
    finally:
        # restore the real view THROUGH the memo: register_views memoizes on
        # the session, so a bare dropTempView would leave every later test's
        # `documents` unresolvable (it broke 8 plan-shape tests once)
        from db_converter_spark.catalog import register_views

        spark._dbc_registered_sf = None
        register_views(spark, SF_DIR)
    assert set(rows) == {"src0", "src1", "src2"}
    for r in rows.values():
        assert r["n_raw"] == 1 and r["n_quality"] == 0 and r["n_final"] == 0


_EDGE_DOCS = [
    # degenerate: empty / whitespace-only (ANSI division guards)
    (1, "", "src0"),
    (2, "   ", "src1"),
    # multi-punctuation: exercises the regexp_replace 'g'-flag split — a
    # first-match-only oracle diverges on n_punct AND on the dedup
    # fingerprint for every one of these rows
    (3, "hello, world! this is fine... really, truly fine!!!", "src2"),
    (4, "hello world this is fine really truly fine", "src2"),
    (5, "hello; world?? this is fine; (really) truly fine...", "src2"),
    # exact-length boundary: exactly 5 tokens
    (6, "alpha beta gamma delta epsilon", "src3"),
    (7, "a b c d", "src4"),  # 4 tokens: below the floor
]


def test_corpus_build_edge_docs_match_duckdb(spark):
    """Spark/oracle parity on the edges the corpus never hits: degenerate
    documents (division guards, CASE semantics) and multi-punctuation text
    (DuckDB regexp_replace needs the 'g' flag — first-match-only replace
    silently diverges on n_punct and the dedup fingerprint). Mirrors the
    mm05 property-test pattern: same rows through both engines."""
    import duckdb

    from db_converter_spark.operators.pipeline import _PIPE05_DUCK, _PIPE05_SPARK

    spark.createDataFrame(
        _EDGE_DOCS, "doc_id long, text string, source string"
    ).createOrReplaceTempView("documents")
    try:
        srows = sorted(tuple(r) for r in spark.sql(_PIPE05_SPARK).collect())
    finally:
        from db_converter_spark.catalog import register_views

        spark._dbc_registered_sf = None
        register_views(spark, SF_DIR)

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", _EDGE_DOCS)
        orows = sorted(tuple(r) for r in con.execute(_PIPE05_DUCK).fetchall())
    finally:
        con.close()
    assert srows == orows
    # docs 3 and 5 normalize to doc 4's fingerprint only under replace-ALL
    # semantics; src2 must therefore report one unique doc across its three
    by_src = {r[0]: r for r in srows}
    assert by_src["src2"][1] == 3 and by_src["src2"][3] == 1  # n_raw, n_unique
