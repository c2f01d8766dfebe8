"""Bucketed-table co-location — the shuffle-elimination strategy for
repeated fact-to-fact joins at 100 TB.

The reference delegates join physical strategy to PostgreSQL; on Spark the
equivalent capacity-planning lever is bucketing: write both fact tables
``bucketBy(N, key)`` once, and every subsequent equi-join or aggregation on
that key skips its Exchange entirely (SortMergeJoin reads co-located
buckets). For a lineitem⋈orders workload run hourly over 100 TB, that
converts the dominant per-run shuffle into a one-time write cost.

Design rules encoded here:
- bucket count ≈ table_size / target_partition_size (128-256 MB compressed);
  both sides MUST use the same count or Spark re-shuffles the smaller side.
- ``sortBy(key)`` inside buckets lets SMJ skip its Sort too.
- bucketed tables must be saved through the session catalog
  (``saveAsTable``) — path-based parquet loses bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_converter_spark.catalog import load_table


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int,
    db: str = "bucketed",
) -> str:
    """Write a testdata table as a bucketed managed table; returns its
    qualified name. One-time cost that removes the key's Exchange from
    every later join/agg."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    qualified = f"{db}.{table}"
    spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    (
        load_table(spark, sf_dir, table)
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(qualified)
    )
    return qualified


def colocated_order_lineitem_join(
    spark: SparkSession, lineitem_tbl: str, orders_tbl: str
) -> DataFrame:
    """Revenue per order priority via a lineitem⋈orders join on o_orderkey.
    Over bucketed inputs this plans a SortMergeJoin with NO Exchange on
    either side (verified by tests/test_bucketing.py); over plain parquet
    the same query shuffles both tables."""
    from pyspark.sql import functions as F

    li = spark.table(lineitem_tbl)
    o = spark.table(orders_tbl)
    # hint("merge"): force SortMergeJoin even when one side is small enough
    # to broadcast — at 100 TB neither fact side broadcasts, and SMJ over
    # co-located buckets is exactly the plan we're demonstrating.
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchanges in the final physical plan (broadcast
    exchanges excluded) — the metric bucketing is meant to drive to zero
    for the join stage."""
    # AdaptiveSparkPlan.toString() prints BOTH "Final Plan" and "Initial
    # Plan" sections — count only the final one.
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
