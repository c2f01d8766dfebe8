"""Salting helpers must produce results identical to their unsalted
equivalents (the whole point: same answer, different shuffle layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_converter_spark.functions.skew import salted_agg, salted_join


@pytest.fixture()
def skewed_df(spark):
    # 90% of rows share key 0 — the canonical hot-key shape
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_agg_matches_plain(spark, skewed_df):
    plain = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in skewed_df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed_df,
            ["k"],
            {"s": "sum(v)", "c": "count(v)", "mn": "min(v)", "mx": "max(v)"},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_nonalgebraic(skewed_df):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed_df, ["k"], {"a": "avg(v)"})


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d_"), F.col("id")).alias("name")
    )
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in skewed_df.join(dim, ["k"]).collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(skewed_df, dim, ["k"], n_salts=8).collect()
    )
    assert salted == plain
    assert len(salted) > 9000  # the hot key really joined


def test_salted_join_left(spark, skewed_df):
    dim = spark.range(1, 50).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    plain = skewed_df.join(dim, ["k"], "left").count()
    salted = salted_join(skewed_df, dim, ["k"], n_salts=4, how="left").count()
    assert salted == plain
