# Port of reference 03_step.sql: insert 3 rows into the CLONE and validate
# through the cloned view (ids shifted +100 directly — the reference's
# trigger did the shift; triggers have no Spark analog).
ctx.execute(
    "INSERT INTO schema_1.test_tbl"
    " SELECT v + 100, v, concat('text_', v)"
    " FROM (SELECT explode(sequence(1, 3)) AS v)"
)
n = spark.sql("select count(1) as n from schema_1.test_tbl_v where id > 100").collect()[0]["n"]
if n != 3:
    raise Exception("test_dba_clone_schema failed")
tmpl = spark.sql("select count(1) as n from template.test_tbl").collect()[0]["n"]
if tmpl != 0:
    raise Exception("clone leaked writes back into the template schema")
ctx.raise_notice("NOTICE", "clone validated: view reads 3 shifted rows, template untouched")
