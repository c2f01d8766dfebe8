"""HLL sketch distinct-count: estimate must sit within the sketch's error
bound of the exact answer (lgK=14 ⇒ RSE ~0.8%; assert a loose 5%)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_converter_spark.catalog import load_table
from db_converter_spark.registry import all_queries
from tests.conftest import SF_DIR


def test_hll_estimate_within_bound(spark):
    q = all_queries()["ta05_hll_distinct"]
    rows = {r["source"]: r for r in q.builder(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for src, n in exact.items():
        assert rows[src]["exact_distinct_texts"] == n
        assert rows[src]["hll_within_bound"], (src, n)
