"""pg_catalog emulation + alert/dba packet ports (reference:
packets/alert_check_autovacuum, packets/dba_top_tables,
packets/alert_int4_capacity; SURVEY §4.3 catalog emulation)."""

from __future__ import annotations

from pathlib import Path

import pytest

from db_converter_spark.plans.model import PacketStatus, ResultCode
from db_converter_spark.plans.pgdialect import rewrite
from db_converter_spark.plans.runner import PacketRunner

PACKETS_DIR = Path(__file__).resolve().parent.parent / "packets"


def _write_packet(path: Path, files: dict[str, str]) -> Path:
    path.mkdir(parents=True, exist_ok=True)
    for name, text in files.items():
        (path / name).write_text(text)
    return path


@pytest.fixture(scope="module")
def runner(spark, tmp_path_factory):
    return PacketRunner(spark, tmp_path_factory.mktemp("pgcat_wh"))


@pytest.fixture(scope="module")
def alert_db(spark, runner, tmp_path_factory):
    """One db with: an autovacuum-disabled table, a big table, and a
    near-int4-capacity column — the three alert targets."""
    setup = _write_packet(
        tmp_path_factory.mktemp("pkt") / "setup",
        {
            "01_step.sql": (
                "create table av_t (a int) using parquet;\n"
                "ALTER TABLE av_t SET (autovacuum_enabled = false);\n"
                "create table big_t using parquet as"
                " select v as id, concat('text_', v) as txt"
                " from (select explode(sequence(1, 200000)) as v);\n"
                "create table cap_t using parquet as"
                " select cast(v as int) as near_cap_id"
                " from (select explode(array(2000000000, 1999999999)) as v)"
            ),
            "meta_data.json": '{"dialect": "postgres", "type": "default"}',
        },
    )
    res = runner.run(setup, dbs=["pgcat_db"])
    assert res.result_code["pgcat_db"] == ResultCode.SUCCESS, res.result_data["pgcat_db"]
    return "pgcat_db"


# ----------------------------------------------------------- dialect rewrites


def test_rewrite_containment_operators():
    out = rewrite("select * from t where '{x}'::text[] @> opts")
    assert "array_except" in out and "@>" not in out
    assert "array('x')" in out
    out2 = rewrite("select a <@ b from t")
    assert "array_except" in out2 and "<@" not in out2


def test_rewrite_alter_set_options():
    out = rewrite("ALTER TABLE t SET (autovacuum_enabled = false)")
    assert out.strip() == "ALTER TABLE t SET TBLPROPERTIES ('autovacuum_enabled'='false')"
    out2 = rewrite("ALTER TABLE t RESET (autovacuum_enabled)")
    assert "UNSET TBLPROPERTIES IF EXISTS ('autovacuum_enabled')" in out2
    # non-option SET (plain column update syntax) stays untouched
    assert "TBLPROPERTIES" not in rewrite("UPDATE t SET (a, b) = (1, 2)")


# -------------------------------------------------------------- catalog views


def test_pg_class_reloptions_roundtrip(spark, runner, alert_db):
    from db_converter_spark.pg_catalog import create_pg_catalog_views

    create_pg_catalog_views(spark, [alert_db])
    opts = {
        r["relname"]: r["reloptions"]
        for r in spark.sql("select relname, reloptions from pg_class").collect()
    }
    assert opts["av_t"] == ["autovacuum_enabled=false"]
    assert opts["big_t"] is None  # no user options → NULL, like PG
    cls = spark.sql(
        "select c.relname, n.nspname, c.relkind, c.relpages from pg_class c"
        " join pg_namespace n on n.oid = c.relnamespace"
    ).collect()
    assert all(r["nspname"] == alert_db and r["relkind"] == "r" for r in cls)
    pages = {r["relname"]: r["relpages"] for r in cls}
    assert pages["big_t"] > 10  # ~1.7 MB of parquet


def test_pg_attribute_types(spark, alert_db):
    from db_converter_spark.pg_catalog import create_pg_catalog_views

    create_pg_catalog_views(spark, [alert_db])
    atts = {
        (r["relname"], r["attname"]): r["typname"]
        for r in spark.sql(
            "select c.relname, a.attname, t.typname from pg_attribute a"
            " join pg_class c on c.oid = a.attrelid"
            " join pg_type t on t.oid = a.atttypid"
        ).collect()
    }
    assert atts[("cap_t", "near_cap_id")] == "int4"
    assert atts[("big_t", "id")] == "int4"
    assert atts[("big_t", "txt")] == "text"


# -------------------------------------------------------------- packet ports


def test_alert_check_autovacuum(runner, spark, alert_db, tmp_path):
    # av_t has autovacuum disabled → alert raises, naming the table
    res = runner.run(PACKETS_DIR / "alert_check_autovacuum", dbs=[alert_db])
    assert res.result_code[alert_db] == ResultCode.FAIL
    assert res.packet_status[alert_db] == PacketStatus.EXCEPTION
    flat = str(res.result_data[alert_db])
    assert "autovacuum_enabled=false on some tables" in flat and "av_t" in flat

    # re-enable → alert passes
    fix = _write_packet(
        tmp_path / "fix",
        {
            "01_step.sql": "ALTER TABLE av_t SET (autovacuum_enabled = true)",
            "meta_data.json": '{"dialect": "postgres", "type": "default"}',
        },
    )
    assert runner.run(fix, dbs=[alert_db]).result_code[alert_db] == ResultCode.SUCCESS
    res2 = runner.run(PACKETS_DIR / "alert_check_autovacuum", dbs=[alert_db])
    assert res2.result_code[alert_db] == ResultCode.SUCCESS


def test_dba_top_tables(runner, alert_db):
    res = runner.run(PACKETS_DIR / "dba_top_tables", dbs=[alert_db])
    assert res.result_code[alert_db] == ResultCode.SUCCESS
    table = res.result_data[alert_db]["01_step.sql"][0]
    cols, rows = table[0], table[1:]
    assert cols[:3] == ["nspname", "relname", "size"]
    by_name = {r[1]: r for r in rows}
    assert "big_t" in by_name  # the only table over the 10-page floor
    assert by_name["big_t"][2].endswith(("kB", "MB"))


def test_alert_int4_capacity(runner, alert_db):
    res = runner.run(PACKETS_DIR / "alert_int4_capacity", dbs=[alert_db])
    assert res.result_code[alert_db] == ResultCode.SUCCESS
    results = res.result_data[alert_db]["01_step.sql"]
    # rows only for the near-capacity column; others stay header-only
    alerts = [
        r
        for table in results
        if table and isinstance(table[0], list) and len(table) > 1
        for r in table[1:]
    ]
    assert len(alerts) == 1
    path, typ, cur, ratio = alerts[0]
    assert path.endswith("cap_t.near_cap_id") and typ == "int4"
    assert cur == 2000000000 and 0.9 < ratio < 1.0


def test_alert_bloat_math_over_real_rows(spark, tmp_path):
    """The alert_bloat port's estimation chain must EXECUTE over real rows,
    not just analyze: build a >2000-page (>16 MB) analyzed table with a
    fillfactor reloption so step1's filters admit it, run the packet, and
    require DONE/SUCCESS with both steps captured (the ioguix math computes
    pages/tuple-sizes; the 80% alert threshold itself needn't fire on a
    freshly written table)."""
    from db_converter_spark.plans.model import ResultCode
    from db_converter_spark.plans.runner import PacketRunner

    db = "bloatdb"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {db}.fat")
    spark.sql(
        f"CREATE TABLE {db}.fat USING parquet AS"
        "  SELECT id, concat(uuid(), uuid(), uuid(), uuid()) AS pad, CAST(id % 1000 AS INT) AS grp"
        "  FROM range(500000)"
    )
    spark.sql(f"ALTER TABLE {db}.fat SET TBLPROPERTIES ('fillfactor'='90')")
    from db_converter_spark.operators.maintenance import route_maintenance

    route_maintenance(spark, f"analyze {db}.fat")

    from db_converter_spark.pg_catalog import create_pg_catalog_views

    create_pg_catalog_views(spark, [db])
    relpages = spark.sql(
        "select relpages from pg_class where relname = 'fat'"
    ).collect()[0][0]
    assert relpages > 2000, f"fixture too small: {relpages} pages"
    # pg_stats populated by the ANALYZE column pass — step1's join hinges on it
    assert spark.sql("select * from pg_stats where tablename='fat'").count() == 3

    runner = PacketRunner(spark, tmp_path / "wh")
    res = runner.run("packets/alert_bloat", dbs=[db])
    assert res.result_code[db] == ResultCode.SUCCESS, res.result_data[db]
    data = res.result_data[db]
    assert set(data) == {"01_step.sql", "02_step.sql"}
    # header row of the heap-bloat report is captured (column shape proof)
    flat = str(data["02_step.sql"])
    assert "bloat_pct" in flat and "table_size" in flat
