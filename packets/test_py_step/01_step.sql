DROP TABLE IF EXISTS test_tbl_import;
CREATE TABLE test_tbl_import
(
    dir STRING,
    fname STRING,
    content STRING
) USING parquet
