CREATE TABLE IF NOT EXISTS demo_gen_tbl (nsp STRING, obj STRING, n INT) USING parquet
