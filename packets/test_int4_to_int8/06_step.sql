-- Port of reference 06_step.sql: the constraint/rename/drop swap dance
-- becomes a CTAS swap — same end state (id is the widened column), one
-- parallel scan->write instead of catalog surgery. The serial machinery
-- ports directly now: the sequence lives in the ledger (plans/sequences.py)
-- and the column default is recorded driver-side (dbc.default.id).
DROP TABLE IF EXISTS test_tbl__new;
CREATE TABLE test_tbl__new USING parquet AS
  SELECT CAST(id_new AS BIGINT) AS id, fld_1, fld_2 FROM test_tbl;
DROP TABLE test_tbl;
ALTER TABLE test_tbl__new RENAME TO test_tbl;
CREATE SEQUENCE IF NOT EXISTS test_tbl_id_seq START WITH 200011;
ALTER TABLE test_tbl ALTER COLUMN id SET DEFAULT nextval('test_tbl_id_seq');
ALTER SEQUENCE test_tbl_id_seq OWNED BY test_tbl.id
