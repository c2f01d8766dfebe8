CREATE TABLE IF NOT EXISTS demo_dml_tbl (id BIGINT, grp STRING, amt BIGINT) USING parquet
