"""point_in_interval_join: semantics + the no-nested-loop plan guarantee."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from db_converter_spark.operators.events import point_in_interval_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_point_in_interval_semantics(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:15:00")),  # inside iv A
            (2, _ts("2024-01-01 10:30:00")),  # == iv A end (exclusive) → out
            (3, _ts("2024-01-01 10:00:00")),  # == iv A start (inclusive) → in
            (4, _ts("2024-01-02 00:10:00")),  # inside iv B (crosses bucket)
            (5, _ts("2024-01-03 00:00:00")),  # in no interval
        ],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00")),
            ("B", _ts("2024-01-01 23:50:00"), _ts("2024-01-02 00:20:00")),
        ],
        "iv string, start_ts timestamp, end_ts timestamp",
    )
    out = point_in_interval_join(points, "ts", ivs, "start_ts", "end_ts", 1800)
    got = sorted((r["pid"], r["iv"]) for r in out.collect())
    assert got == [(1, "A"), (3, "A"), (4, "B")]


def test_no_nested_loop_join(spark):
    points = spark.range(1000).select(
        F.col("id").alias("pid"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    ivs = spark.range(500).select(
        F.col("id").alias("iv"),
        F.timestamp_seconds(F.col("id") * 120).alias("start_ts"),
        F.timestamp_seconds(F.col("id") * 120 + 1800).alias("end_ts"),
    )
    out = point_in_interval_join(points, "ts", ivs, "start_ts", "end_ts", 1800)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
