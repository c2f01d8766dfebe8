# Port of reference 05_step.sql (CREATE UNIQUE INDEX CONCURRENTLY): parquet
# has no indexes; the semantic content of a UNIQUE index build is the
# uniqueness proof, which is this one aggregate.
r = spark.sql(
    "select count(*) as c, count(distinct id_new) as d from test_tbl"
).collect()[0]
if r["c"] != r["d"]:
    raise Exception(f"id_new not unique: {r['c']} rows, {r['d']} distinct")
ctx.raise_notice("NOTICE", "id_new uniqueness validated (unique-index port)")
