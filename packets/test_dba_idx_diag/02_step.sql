-- table without indexes (reference 00_prepare.sql part 2)
drop table if exists tbl_index_case_2;
CREATE TABLE tbl_index_case_2
(
    id bigint,
    fld_1 integer
) USING parquet;

INSERT INTO tbl_index_case_2 (id, fld_1)
    select v, v from (select generate_series(1, 10) as v) T;

INSERT INTO tbl_index_case_2 (id, fld_1)
    select v, v from (select generate_series(1, 250000) as v) T;

analyze tbl_index_case_2;
