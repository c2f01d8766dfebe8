# Port of reference packets/dba_clone_schema/01_step.sql: the ~500-line
# plpgsql clone_schema/clone_schema_exec installer collapses to the library
# call — Spark has no sequences/FKs/triggers/functions to clone, so the
# operator handles exactly tables (+data) and views
# (operators/schema_ops.py). Parameterized via CLI placeholders:
#   --placeholders CLONE_SRC=template CLONE_DST=schema_1
from db_converter_spark.operators.schema_ops import clone_schema

src, dst = "DBC_PL_CLONE_SRC", "DBC_PL_CLONE_DST"
if src.startswith("DBC_PL_"):
    ctx.raise_notice(
        "NOTICE",
        "clone_schema installed (library op); pass placeholders"
        " CLONE_SRC / CLONE_DST to clone now",
    )
else:
    for cmd in clone_schema(spark, src, dst, dry_run=True):
        ctx.raise_notice("NOTICE", cmd)  # the reference's dry-run NOTICE stream
    clone_schema(spark, src, dst, dry_run=False)
    ctx.raise_notice("LOG", f"clone_schema: {src} -> {dst} done")
