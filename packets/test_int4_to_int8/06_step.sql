-- Port of reference 06_step.sql: the constraint/rename/drop swap dance
-- becomes a CTAS swap — same end state (id is the widened column), one
-- parallel scan->write instead of catalog surgery.
DROP TABLE IF EXISTS test_tbl__new;
CREATE TABLE test_tbl__new USING parquet AS
  SELECT CAST(id_new AS BIGINT) AS id, fld_1, fld_2 FROM test_tbl;
DROP TABLE test_tbl;
ALTER TABLE test_tbl__new RENAME TO test_tbl
