"""Unit tests for the generic as-of join operator (events.asof_join)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from db_converter_spark.operators.events import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100, "p-before-any"),
            (1, _ts("2024-01-01 12:00:00"), 101, "p-after-one"),
            (1, _ts("2024-01-01 14:00:00"), 102, "p-same-instant"),
            (2, _ts("2024-01-01 09:00:00"), 103, "other-key"),
        ],
        "user_id long, ts timestamp, event_id long, label string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 11:00:00"), 50, 11.0),
            (1, _ts("2024-01-01 14:00:00"), 51, 14.0),  # same instant as 102
            (3, _ts("2024-01-01 08:00:00"), 52, 8.0),  # unrelated key
        ],
        "user_id long, ts timestamp, event_id long, v double",
    )
    out = asof_join(left, right, on=["user_id"], ts_col="ts", payload=["v"], seq_col="event_id")
    got = {r["event_id"]: r["asof_v"] for r in out.collect()}
    assert got == {
        100: None,  # no right row at-or-before
        101: 11.0,  # most recent prior
        102: 14.0,  # same-instant right row counts (right sorts first)
        103: None,  # key has no right rows at all
    }
    # left-only columns pass through
    assert set(out.columns) >= {"user_id", "ts", "event_id", "label", "asof_v"}


def test_asof_join_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("seq"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
        (F.col("id") + 1000).alias("seq"),
        F.col("id").alias("payload"),
    )
    out = asof_join(left, right, on=["k"], ts_col="ts", payload=["payload"], seq_col="seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + one window ⇒ exactly one Exchange (hash on k), no join operator
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
