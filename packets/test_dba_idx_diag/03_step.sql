-- table with missed index + fk test data (reference 00_prepare.sql parts 3-4)
drop table if exists tbl_index_case_3;
CREATE TABLE tbl_index_case_3
(
    id bigint,
    fld_1 integer
) USING parquet;
CREATE UNIQUE INDEX tbl_index_case_3_pkey ON tbl_index_case_3 (id);

INSERT INTO tbl_index_case_3 (id, fld_1)
    select v, v from (select generate_series(1, 250000) as v) T;

analyze tbl_index_case_3;

drop table if exists tbl_a;
drop table if exists tbl_b;

CREATE TABLE tbl_a
(
    id bigint,
    tbl_b_id integer,
    some_fld integer
) USING parquet;
CREATE UNIQUE INDEX tbl_a_pk ON tbl_a (id);

CREATE TABLE tbl_b
(
    id bigint,
    tbl_a_id integer,
    some_fld integer
) USING parquet;
CREATE UNIQUE INDEX tbl_b_pk ON tbl_b (id);

INSERT INTO tbl_a (id, tbl_b_id) SELECT v, v from (SELECT generate_series(1,10000) as v) T;
INSERT INTO tbl_b (id, tbl_a_id) SELECT v, v from (SELECT generate_series(1,10000) as v) T;

analyze tbl_a;
analyze tbl_b;
