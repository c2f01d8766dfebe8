DROP TABLE IF EXISTS test_wait_tx_tbl;
CREATE TABLE test_wait_tx_tbl
(
    fld_1 integer
) USING parquet;
INSERT INTO test_wait_tx_tbl(fld_1) VALUES (1);
