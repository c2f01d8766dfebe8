"""HLL sketch distinct-count: estimate must sit within the sketch's error
bound of the exact answer (lgK=14 ⇒ RSE ~0.8%; assert a loose 5%)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_converter_spark.catalog import load_table
from db_converter_spark.registry import all_queries
from tests.conftest import SF_DIR


def test_hll_estimate_within_bound(spark):
    q = all_queries()["ta05_hll_distinct"]
    approx = {r["source"]: r["approx_distinct_texts"] for r in q.builder(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for src, n in exact.items():
        assert abs(approx[src] - n) <= max(2, 0.05 * n), (src, approx[src], n)
