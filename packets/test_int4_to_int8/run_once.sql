-- Port of reference packets/test_int4_to_int8/run_once.sql. `id serial`
-- (int4) becomes an explicit INT column carrying the same 1..200010 values;
-- the sequence default is emulated where needed (07_step).
DROP TABLE IF EXISTS test_tbl;
CREATE TABLE test_tbl USING parquet AS
  SELECT CAST(v AS INT) AS id, CAST(v AS BIGINT) AS fld_1, concat('text_', v) AS fld_2
  FROM (SELECT explode(sequence(1, 200010)) AS v)
