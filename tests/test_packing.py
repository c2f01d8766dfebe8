"""pipe02 sequence packing: the distributed two-phase prefix sum must be
PARTITIONING-INVARIANT — global cumulative positions (and therefore every
block assignment) identical whatever the partition count. That invariance is
the whole correctness argument for replacing the single-partition global
window with per-partition windows + driver-side offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark):
    from db_converter_spark.catalog import load_table

    return load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        "source",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))").alias("n_tok"),
    )


def test_pack_invariant_under_partition_count(spark):
    from db_converter_spark.operators.pipeline import _pack

    docs = _docs(spark)
    one = {tuple(r) for r in _pack(spark, docs, 2).collect()}
    many = {tuple(r) for r in _pack(spark, docs, 16).collect()}
    assert one and one == many


def test_pack_totals_match_plain_window(spark, duck):
    """Cross-engine: per-source totals equal DuckDB's single-stream window
    formulation (the oracle), pinning the offset arithmetic."""
    from db_converter_spark.operators.pipeline import (
        _PIPE02_DUCK,
        pipe02_sequence_pack,
    )

    got = {tuple(r) for r in pipe02_sequence_pack(spark, SF_DIR).collect()}
    want = {tuple(r) for r in duck.sql(_PIPE02_DUCK).fetchall()}
    assert got == want
