# Port of reference 04_step.sql: the NOT NULL CHECK constraint + VALIDATE
# becomes an explicit full-scan validation (Spark has no table constraints;
# the scan IS the VALIDATE CONSTRAINT).
n = spark.sql("select count(*) as n from test_tbl where id_new is null").collect()[0]["n"]
if n:
    raise Exception(f"id_new NOT NULL validation failed: {n} null values")
ctx.raise_notice("NOTICE", "id_new NOT NULL validated")
