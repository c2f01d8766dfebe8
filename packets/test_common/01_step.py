# Port of reference packets/test_common/01_step.sql: the DO block PERFORMs
# (evaluates and discards) a row - py twin does the same.
spark.sql("select 1, 2, 3").collect()
