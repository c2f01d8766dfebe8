DROP TABLE IF EXISTS test_tbl_export_1;
DROP TABLE IF EXISTS test_tbl_export_2;
CREATE TABLE test_tbl_export_1 USING parquet AS
  SELECT v AS id, CAST(v AS BIGINT) AS fld_1, concat('text_', v) AS fld_2
  FROM (SELECT explode(sequence(1, 200000)) AS v);
CREATE TABLE test_tbl_export_2 USING parquet AS
  SELECT v AS id, CAST(v AS BIGINT) AS fld_1, concat('text_', v) AS fld_2
  FROM (SELECT explode(sequence(1, 200000)) AS v)
