-- Port of reference packets/test_dba_clone_schema/01_step.sql. The
-- trigger/function pair (id := id + 100 on insert) has no Spark analog —
-- 03_step inserts the shifted ids directly and validates through the
-- cloned VIEW, which is the clonable surface being tested.
DROP DATABASE IF EXISTS schema_1 CASCADE;
DROP DATABASE IF EXISTS template CASCADE;
CREATE DATABASE template;
CREATE TABLE template.test_tbl
(
    id INT,
    fld_1 BIGINT,
    fld_2 STRING
) USING parquet;
CREATE VIEW template.test_tbl_v AS
    SELECT * FROM template.test_tbl
