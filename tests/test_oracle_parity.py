"""Every registered query with an oracle must match DuckDB bit-for-bit at
sf0.001 — the same check the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from db_converter_spark.registry import all_queries
from tests.conftest import SF_DIR, assert_oracle_match

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spec = _QUERIES[name]
    df = spec.builder(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak path
        return
    assert_oracle_match(df, duck, spec.oracle, name)
