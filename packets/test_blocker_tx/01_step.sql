DROP TABLE IF EXISTS test_blocker_tx_tbl;
CREATE TABLE test_blocker_tx_tbl
(
    fld_1 integer
) USING parquet;
INSERT INTO test_blocker_tx_tbl(fld_1) VALUES (1);
