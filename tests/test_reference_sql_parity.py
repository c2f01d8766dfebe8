"""Verbatim reference-SQL parity sweep: every SELECT statement in every
reference packet must rewrite through the PG dialect pass and pass Spark
analysis over the emulated pg_catalog/instance views — UNMODIFIED.

This is the "a user of the reference could run every query they run
today" guarantee at the dialect level; the ported packets in packets/
additionally verify execution results. Documented exceptions:

- ``DO $$…$$`` blocks — py-step twins by design (SURVEY §2.10);
- DML/DDL statements — analysis needs the live objects each packet
  creates; execution is covered by the ported packet corpus instead.

``nextval()``/sequence DDL now rewrites cleanly: the runner inlines
sequence calls from ledger-managed counters (plans/sequences.py), so no
statement in the corpus raises UnsupportedConstruct anymore.
"""

from __future__ import annotations

import glob
import re

import pytest

from db_converter_spark.catalog import create_information_schema_views
from db_converter_spark.functions import register_pg_compat
from db_converter_spark.pg_catalog import (
    create_pg_catalog_views,
    create_pg_instance_views,
)
from db_converter_spark.plans.pgdialect import UnsupportedConstruct, rewrite
from db_converter_spark.plans.sqlsplit import split_statements, statement_kind

REF_GLOB = "/root/reference/packets/*/*.sql"

# statements that intentionally do NOT pass (none since the sequence shim)
_EXPECTED_UNSUPPORTED: set[str] = set()


@pytest.fixture(scope="module")
def pg_env(spark):
    register_pg_compat(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS refparity")
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase("refparity")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS refparity.probe (id bigint, name string)"
        " USING parquet"
    )
    create_pg_catalog_views(spark, ["refparity"])
    create_pg_instance_views(spark)
    create_information_schema_views(spark, "refparity")
    yield spark
    spark.catalog.setCurrentDatabase(prev)


def _ref_selects():
    for f in sorted(glob.glob(REF_GLOB)):
        text = open(f, encoding="utf8", errors="replace").read()
        for stmt in split_statements(text):
            s = stmt.strip()
            if not s or re.match(r"^\s*do\b", s, re.I):
                continue
            yield f, s


def test_reference_selects_analyze_verbatim(pg_env):
    spark = pg_env
    ok = 0
    failures: list[str] = []
    for f, s in _ref_selects():
        short = "/".join(f.split("/")[-2:])
        try:
            rs = rewrite(s)
        except UnsupportedConstruct:
            if short not in _EXPECTED_UNSUPPORTED:
                failures.append(f"{short}: unexpected UnsupportedConstruct")
            continue
        if statement_kind(rs) != "query":
            continue  # DML/DDL covered by the ported packet corpus
        try:
            spark.sql("EXPLAIN " + rs).collect()
            ok += 1
        except Exception as e:  # noqa: BLE001 — collected for the report
            failures.append(f"{short}: {str(e).splitlines()[0][:140]}")
    assert not failures, "\n".join(failures)
    # the corpus is 46 packets; a collapsed glob or reference move should
    # fail loudly rather than silently passing on 0 statements
    assert ok >= 80, f"only {ok} statements analyzed — reference tree moved?"
