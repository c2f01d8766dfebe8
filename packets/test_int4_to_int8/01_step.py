# Port of reference packets/test_int4_to_int8/01_step.sql: the conditional
# plpgsql DO block becomes a py-step (SURVEY §2.10). The trigger-maintained
# dual-write has no Spark analog and is unnecessary: batch re-runs + the
# action ledger give the same convergence (SURVEY §1.4), so only the
# conditional ADD COLUMN is kept.
cols = [f.name for f in spark.table("test_tbl").schema.fields]
if "id_new" not in cols:
    spark.sql("ALTER TABLE test_tbl ADD COLUMNS (id_new BIGINT)")
    ctx.raise_notice("NOTICE", "id_new added (trigger dual-write not needed on Spark)")
else:
    ctx.raise_notice("NOTICE", "id_new already present, skipping")
