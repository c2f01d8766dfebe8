"""Packet-corpus sweep + golden-output tests — the reference's test layers
1 and 2 (reference: tests/test_packets.py:38-116 sweep, :844-939 goldens)
over the packets/ directory shipped with this repo."""

from __future__ import annotations

from pathlib import Path

import pytest

from db_converter_spark.plans.golden import check_golden_outputs
from db_converter_spark.plans.model import PacketStatus, ResultCode
from db_converter_spark.plans.runner import PacketRunner

PACKETS_DIR = Path(__file__).resolve().parent.parent / "packets"
SWEEP = sorted(
    p.name for p in PACKETS_DIR.iterdir() if p.is_dir() and p.name != "templates"
)


@pytest.fixture(scope="module")
def runner(spark, tmp_path_factory):
    return PacketRunner(spark, tmp_path_factory.mktemp("corpus_wh"))


@pytest.mark.parametrize("name", SWEEP)
def test_packet_sweep(runner, name, tmp_path):
    """Every shipped packet must run to DONE (FAIL expected only for packets
    named *exception*, mirroring the reference's rule at :93-96)."""
    db = f"sweep_{name}"
    res = runner.run(
        PACKETS_DIR / name, dbs=[db], export_dir=tmp_path / "exp"
    )
    if "exception" in name:
        assert res.result_code[db] == ResultCode.FAIL
    else:
        assert res.result_code[db] == ResultCode.SUCCESS, res.result_data[db]
        assert res.packet_status[db] == PacketStatus.DONE


def test_sweep_rerun_is_idempotent(runner, spark):
    """Re-running the generator packet must not duplicate rows (action
    ledger dedup — the resume semantics, reference: dbccore:941-951)."""
    db = "sweep_demo_gens"
    res1 = runner.run(PACKETS_DIR / "demo_gens", dbs=[db])
    assert res1.result_code[db] == ResultCode.SUCCESS
    n = spark.table(f"{db}.demo_gen_tbl").count()
    assert n == 6  # 3 nsp × 2 obj
    res2 = runner.run(PACKETS_DIR / "demo_gens", dbs=[db])
    assert res2.result_code[db] == ResultCode.SUCCESS
    assert spark.table(f"{db}.demo_gen_tbl").count() == n


@pytest.mark.parametrize("name", ["demo_read_only", "demo_pg_dialect", "demo_dml", "demo_chunked_migration"])
def test_packet_goldens(runner, name):
    """Captured resultsets must match the committed golden files
    byte-for-byte (``<SKIP>`` lines masked)."""
    db = f"golden_{name}"
    res = runner.run(PACKETS_DIR / name, dbs=[db])
    assert res.result_code[db] == ResultCode.SUCCESS
    diffs = check_golden_outputs(PACKETS_DIR / name, res, db)
    assert diffs == {}, diffs


def test_resume_after_transient_failure(spark, tmp_path):
    """Crash-consistency (reference: reconnect-and-resume, dbccore:410-448):
    step 2 fails on the first run AFTER step 1 applied its actions; the
    re-run must skip step 1's ledgered actions and complete step 2."""
    pdir = tmp_path / "resume_pkt"
    pdir.mkdir()
    marker = tmp_path / "fail_once.marker"
    (pdir / "run_once.sql").write_text(
        "CREATE TABLE IF NOT EXISTS resume_t (v INT) USING parquet"
    )
    (pdir / "01_step.sql").write_text("insert into resume_t values (1)")
    (pdir / "02_step.py").write_text(
        f"import pathlib\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        f"if not m.exists():\n"
        f"    m.write_text('fired')\n"
        f"    raise RuntimeError('transient failure — retry me')\n"
        f"ctx.execute('insert into resume_t values (2)')\n"
    )
    runner = PacketRunner(spark, tmp_path / "wh")
    res1 = runner.run(pdir, dbs=["resume_db"])
    assert res1.result_code["resume_db"] == ResultCode.FAIL
    assert spark.table("resume_db.resume_t").count() == 1

    res2 = runner.run(pdir, dbs=["resume_db"])
    assert res2.result_code["resume_db"] == ResultCode.SUCCESS
    # writes happened in the runner's per-target session; refresh this
    # session's cached file listing before reading (see PacketRunner docs)
    spark.catalog.refreshTable("resume_db.resume_t")
    rows = sorted(r.v for r in spark.table("resume_db.resume_t").collect())
    assert rows == [1, 2]  # step 1 NOT re-applied, step 2 completed
