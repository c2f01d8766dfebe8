# Port of reference 02_step.sql: clone_schema('template','schema_1') dry-run
# first (NOTICE stream), then for real.
from db_converter_spark.operators.schema_ops import clone_schema

for cmd in clone_schema(spark, "template", "schema_1", dry_run=True):
    ctx.raise_notice("NOTICE", cmd)
clone_schema(spark, "template", "schema_1", dry_run=False)
ctx.raise_notice("LOG", "clone complete")
