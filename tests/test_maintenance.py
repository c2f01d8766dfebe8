"""Maintenance-statement surface (reference: packets/test_maint/01-06,
packets/test_wait_tx/03_step.sql): VACUUM / ANALYZE / CREATE-DROP INDEX
mapped onto parquet per operators/maintenance.py, plus the pg_index /
pg_stats emulation built from what the statements record."""

from __future__ import annotations

import pytest

from db_converter_spark.operators.maintenance import (
    list_indexes,
    route_maintenance,
)
from db_converter_spark.pg_catalog import (
    create_pg_catalog_views,
    create_pg_instance_views,
)

DB = "maintdb"


@pytest.fixture(scope="module")
def mdb(spark):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    spark.sql(f"DROP TABLE IF EXISTS {DB}.mt")
    spark.sql(
        f"CREATE TABLE {DB}.mt USING parquet AS"
        " SELECT id, concat('v_', id) AS s, id % 7 AS grp FROM range(5000)"
    )
    return DB


def test_non_maintenance_passthrough(spark, mdb):
    assert route_maintenance(spark, "select 1") is None
    assert route_maintenance(spark, "insert into x values (1)") is None
    assert route_maintenance(spark, "create table t (a int)") is None
    # DROP TABLE is not DROP INDEX
    assert route_maintenance(spark, "drop table if exists x") is None


def test_vacuum_plain_is_noop(spark, mdb):
    status, notices = route_maintenance(spark, f"vacuum {DB}.mt")
    assert status == ["VACUUM"]
    assert any("no dead tuples" in m for _, m in notices)
    assert spark.table(f"{DB}.mt").count() == 5000


def test_analyze_feeds_pg_class_and_pg_stats(spark, mdb):
    status, _ = route_maintenance(spark, f"analyze {DB}.mt")
    assert status == ["ANALYZE"]
    create_pg_catalog_views(spark, [DB])
    cls = spark.sql(
        "select reltuples from pg_class where relname = 'mt' and relkind='r'"
    ).collect()
    assert cls[0][0] == 5000.0
    st = {
        r["attname"]: r
        for r in spark.sql(
            "select * from pg_stats where tablename = 'mt'"
        ).collect()
    }
    assert st["id"]["null_frac"] == 0.0
    assert st["id"]["avg_width"] == 8


def test_create_drop_index_registry(spark, mdb):
    route_maintenance(spark, f"CREATE INDEX mt_id_idx ON {DB}.mt (id)")
    route_maintenance(
        spark,
        f"CREATE UNIQUE INDEX CONCURRENTLY mt_multi_idx ON {DB}.mt"
        " USING btree (id, s, grp)",
    )
    # PG auto-naming when no name given
    route_maintenance(spark, f"CREATE INDEX ON {DB}.mt USING hash (s)")
    idx = list_indexes(spark, f"{DB}.mt")
    assert set(idx) == {"mt_id_idx", "mt_multi_idx", "mt_s_idx"}
    assert idx["mt_multi_idx"]["unique"] is True
    assert idx["mt_multi_idx"]["cols"] == ["id", "s", "grp"]
    assert idx["mt_s_idx"]["method"] == "hash"

    # IF NOT EXISTS skips; bare duplicate raises (PG parity)
    _, notices = route_maintenance(
        spark, f"CREATE INDEX IF NOT EXISTS mt_id_idx ON {DB}.mt (id)"
    )
    assert any("already exists, skipping" in m for _, m in notices)
    with pytest.raises(ValueError, match="already exists"):
        route_maintenance(spark, f"CREATE INDEX mt_id_idx ON {DB}.mt (id)")
    with pytest.raises(ValueError, match="does not exist"):
        route_maintenance(spark, f"CREATE INDEX bad_idx ON {DB}.mt (nope)")

    status, _ = route_maintenance(spark, f"DROP INDEX {DB}.mt_s_idx")
    assert status == ["DROP"]
    assert "mt_s_idx" not in list_indexes(spark, f"{DB}.mt")
    with pytest.raises(ValueError, match="does not exist"):
        route_maintenance(spark, f"DROP INDEX {DB}.mt_s_idx")
    _, notices = route_maintenance(spark, f"DROP INDEX IF EXISTS {DB}.mt_s_idx")
    assert any("skipping" in m for _, m in notices)


def test_pg_index_views(spark, mdb):
    create_pg_catalog_views(spark, [DB])
    rows = spark.sql(
        """
        select ci.relname, i.indnatts, i.indisunique, i.indisvalid
        from pg_index i
        join pg_class ci on i.indexrelid = ci.oid and ci.relkind = 'i'
        join pg_class cr on i.indrelid = cr.oid and cr.relkind = 'r'
        where cr.relname = 'mt' order by ci.relname
        """
    ).collect()
    names = [r[0] for r in rows]
    assert "mt_id_idx" in names and "mt_multi_idx" in names
    multi = next(r for r in rows if r[0] == "mt_multi_idx")
    assert multi[1] == 3 and multi[2] is True and multi[3] is True
    # indexdef + relation-size lookups resolve through the registered fns
    d = spark.sql(
        "select pg_get_indexdef(indexrelid) from pg_index order by indnatts desc"
    ).collect()[0][0]
    assert d.startswith("CREATE UNIQUE INDEX mt_multi_idx ON maintdb.mt")
    sz = spark.sql(
        "select pg_relation_size(oid) from pg_class where relname='mt'"
    ).collect()[0][0]
    assert sz > 0


def test_vacuum_full_compacts_and_preserves_metadata(spark, mdb):
    # fragment the table into many files, then VACUUM FULL compacts
    spark.sql(f"INSERT INTO {DB}.mt SELECT id, concat('v_', id), id % 7 FROM range(5000, 5100)")
    before = list_indexes(spark, f"{DB}.mt")
    assert before  # registry non-empty from the test above
    status, notices = route_maintenance(spark, f"vacuum full analyze {DB}.mt")
    assert status == ["VACUUM"]
    assert any("rewrote" in m for _, m in notices)
    spark.catalog.refreshTable(f"{DB}.mt")
    assert spark.table(f"{DB}.mt").count() == 5100
    # swap-write carried the recorded indexes (PG: VACUUM FULL keeps indexes)
    assert list_indexes(spark, f"{DB}.mt") == before


def test_reindex_cluster_noop(spark, mdb):
    status, notices = route_maintenance(spark, f"REINDEX TABLE {DB}.mt")
    assert status == ["REINDEX"]
    status, _ = route_maintenance(spark, f"CLUSTER {DB}.mt USING mt_id_idx")
    assert status == ["CLUSTER"]


def test_dry_run_validates_without_executing(spark, mdb):
    status, _ = route_maintenance(spark, f"vacuum {DB}.mt", dry_run=True)
    assert "no_commit" in status
    before = list_indexes(spark, f"{DB}.mt")
    status, _ = route_maintenance(
        spark, f"CREATE INDEX dry_idx ON {DB}.mt (grp)", dry_run=True
    )
    assert "no_commit" in status
    assert list_indexes(spark, f"{DB}.mt") == before  # nothing recorded
    with pytest.raises(Exception):
        route_maintenance(spark, "vacuum no_such_db.no_such_tbl", dry_run=True)


def test_instance_views(spark, mdb):
    create_pg_instance_views(spark)
    dbs = {r[0] for r in spark.sql("select datname from pg_database").collect()}
    assert DB in dbs
    setting = spark.sql(
        "select setting from pg_settings where name = 'spark.sql.shuffle.partitions'"
    ).collect()
    assert setting and setting[0][0]
    # typed-empty instance views answer the lock/replication packets honestly
    assert spark.sql("select * from pg_locks where not granted").count() == 0
    assert spark.sql("select * from pg_stat_replication").count() == 0
    assert spark.sql("select pg_backend_pid()").collect()[0][0] == -1
    act = spark.table("pg_stat_activity")
    assert "query" in act.columns and "state" in act.columns
