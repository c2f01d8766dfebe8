#!/usr/bin/env python
"""Round-1 regression guard, runnable standalone: a VANILLA SparkSession
(none of the engine's confs — exactly what the external correctness driver
builds) must run entry() and a query sample. Round 1 scored 0/50 because
the catalog assumed the session already carried
spark.sql.legacy.parquet.nanosAsLong; catalog._ensure_nanos_readable now
sets it at read time, and this script proves it from the outside."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-twin")
    .getOrCreate()
)
import __spark_entry__ as ent

assert len(ent.entry(spark).collect()) > 0
qs = ent.queries()
for name in (
    "q01_pricing_summary",
    "dd04_minhash_lsh_bands",
    "pipe01_corpus_filter",
    "ta05_hll_distinct",
):
    assert len(qs[name](spark, "/root/testdata/sf0.001").collect()) > 0, name
print("VANILLA OK")
