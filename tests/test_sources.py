"""Source-layer tests: export→reimport CSV round-trip and JDBC chunk
predicate construction."""

from __future__ import annotations

from db_converter_spark.plans.export import export_statements
from db_converter_spark.sources import chunk_predicates, read_export_csv


def test_export_csv_roundtrip_through_source(spark, tmp_path):
    files = export_statements(
        spark,
        "rt",
        [
            "select id, concat('name_', id) as name,"
            " case when id % 3 = 0 then null else id * 1.5 end as score"
            " from range(1, 101)"
        ],
        tmp_path / "exp",
    )
    df = read_export_csv(spark, files[0], schema="id BIGINT, name STRING, score DOUBLE")
    assert df.count() == 100
    rows = {r["id"]: r for r in df.collect()}
    assert rows[3]["score"] is None  # NULL survived the round trip
    assert rows[4]["score"] == 6.0
    assert rows[7]["name"] == "name_7"


def test_chunk_predicates_partition_exactly():
    preds = chunk_predicates(1, 25, 10, "id")
    assert preds == [
        "id >= 1 AND id <= 10",
        "id >= 11 AND id <= 20",
        "id >= 21 AND id <= 25",
    ]
    assert chunk_predicates(5, 5, 10, "id") == ["id >= 5 AND id <= 5"]
    assert chunk_predicates(10, 5, 10, "id") == []


def test_chunk_predicates_cover_all_rows(spark):
    """Union of chunk reads == full read (predicates have no gaps/overlap)."""
    df = spark.range(1, 1001).selectExpr("id", "id * 2 AS v")
    total = 0
    for pred in chunk_predicates(1, 1000, 300, "id"):
        total += df.where(pred).count()
    assert total == 1000


def test_read_jdbc_chunked_call_shape(spark, monkeypatch):
    """The JDBC seam (no driver jar in this container): read_jdbc_chunked
    must hand spark.read.jdbc one predicate per bounded key range — the
    declarative spelling of the reference's 10 000-row cursor loop
    (reference: dbccore/dbccore.py:744). Mocked at the DataFrameReader
    boundary; everything below it is stock Spark."""
    from db_converter_spark.sources.jdbc import read_jdbc_chunked

    captured = {}

    def fake_jdbc(url, table, predicates=None, properties=None, **kw):
        captured.update(url=url, table=table, predicates=predicates,
                        properties=properties)
        return spark.range(1)  # stand-in result frame

    monkeypatch.setattr(
        type(spark.read), "jdbc",
        lambda self, *args, **kw: fake_jdbc(*args, **kw),
        raising=True,
    )

    df = read_jdbc_chunked(
        spark, "jdbc:postgresql://db/x", "public.t", "id", 1, 25_000,
        chunk_size=10_000, properties={"user": "u"},
    )
    assert df.count() == 1
    assert captured["url"].startswith("jdbc:postgresql://")
    assert captured["table"] == "public.t"
    assert captured["properties"] == {"user": "u"}
    preds = captured["predicates"]
    assert len(preds) == 3 and preds[0] == "id >= 1 AND id <= 10000"
    assert preds[-1] == "id >= 20001 AND id <= 25000"


# ------------------------------------------------------------- JSONL corpus


def test_jsonl_roundtrip(spark, tmp_path):
    """Parquet documents → JSONL shards (gzip) → read back: equal rows."""
    from db_converter_spark.catalog import load_table
    from db_converter_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs.repartition(3), out)
    back = read_jsonl(spark, out)
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_bad_lines_policies(spark, tmp_path):
    from db_converter_spark.sources.jsonl import read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}\n'
    )
    path = str(p)
    # drop (default): only the two valid rows
    got = read_jsonl(spark, path)
    assert sorted(r.doc_id for r in got.collect()) == [1, 2]
    assert "_corrupt_record" not in got.columns
    # keep: corrupt line quarantined with the raw text attached
    kept = read_jsonl(spark, path, bad_lines="keep")
    bad = [r for r in kept.collect() if r._corrupt_record is not None]
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record
    # fail: job dies on the malformed line
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        read_jsonl(spark, path, bad_lines="fail").collect()
    # unknown policy rejected
    with pytest.raises(ValueError):
        read_jsonl(spark, path, bad_lines="lenient")


def test_jsonl_extra_and_missing_fields(spark, tmp_path):
    """Interchange reality: dumps carry extra metadata fields (ignored) and
    may omit schema fields (NULL-filled)."""
    from db_converter_spark.sources.jsonl import read_jsonl

    p = tmp_path / "fields.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "t", "url": "http://x", "meta": {"k": 1}}\n'
    )
    row = read_jsonl(spark, str(p)).collect()[0]
    assert row.doc_id == 1 and row.text == "t"
    assert row.lang is None and row.n_chars is None
