"""Skew mitigation — salting helpers for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
tool for the cases AQE can't fix:

- **aggregation skew**: one groupBy key owning a large share of rows makes
  one reducer the straggler. :func:`salted_agg` does a two-phase aggregate —
  partial per (key, salt), final per key — so the hot key spreads over
  ``n_salts`` reducers. Only algebraic aggregates (sum/count/min/max) can be
  re-aggregated this way.
- **join skew with a broadcast-infeasible build side**: :func:`salted_join`
  salts the skewed (probe) side randomly and explodes the build side across
  all salt values — classic replicate-and-salt. Build-side rows are
  duplicated ``n_salts``×, so pick the smallest salt count that tames the
  hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform random salt column in [0, n_salts). Random, not hash-of-key:
    the whole point is to split identical keys apart."""
    return df.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs``: {out_col: "fn(col)"} with
    fn ∈ {sum, count, min, max} (algebraic — partials recombine exactly).

    Phase 1 shuffles on (keys…, salt) — the hot key fans out over n_salts
    reducers; phase 2 shuffles the (tiny) partial rows on the real keys."""
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(", 1)
        fn = fn.strip().lower()
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
        partial_exprs.append(F.expr(spec).alias(f"__p_{out}"))
        refn = "sum" if fn == "count" else fn  # counts re-aggregate by sum
        final_exprs.append(F.expr(f"{refn}(__p_{out})").alias(out))
    return (
        with_salt(df, n_salts)
        .groupBy(*keys, _SALT)
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt join: the skewed side gets a random salt, the
    build side is exploded across every salt value, and the join adds the
    salt to the equi-keys — each hot key's rows spread over n_salts
    partitions. Result columns match a plain ``skewed.join(build, on, how)``.
    """
    s = with_salt(skewed, n_salts)
    b = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(b, [*on, _SALT], how).drop(_SALT)
